"""Per-frame BiLSTM output parity vs the step-by-step numpy oracle — the
BASELINE.json numeric gate's "per-frame log-posteriors allclose vs CPU
reference" surface (SURVEY.md §5.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from flax.core import meta as flax_meta

from neuralasr_tpu.models.bilstm import BiLSTMEncoder, LSTMLayer
from neuralasr_tpu.reference import lstm_oracle


def _unbox(params):
    return flax_meta.unbox(params)


def test_lstm_layer_matches_oracle():
    rng = np.random.default_rng(0)
    B, T, D, H = 3, 11, 5, 7
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    layer = LSTMLayer(H)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    raw = _unbox(params)
    wx, wh, b = (np.asarray(raw[k]) for k in ("wx", "wh", "b"))
    for r in range(B):
        ref = lstm_oracle.lstm_forward(x[r], wx, wh, b)
        np.testing.assert_allclose(out[r], ref, atol=1e-5, rtol=1e-5)


def test_bilstm_encoder_matches_oracle_with_padding():
    """2-layer BiLSTM on a padded batch == per-row oracle on true lengths.

    Exercises the classic parity bug (SURVEY.md §8): the backward direction
    must reverse within each utterance's true length, not within padded T.
    """
    rng = np.random.default_rng(1)
    B, T, D, H, layers = 3, 12, 4, 6, 2
    lens = np.asarray([12, 9, 5], np.int32)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    for r, n in enumerate(lens):
        x[r, n:] = 13.0  # poison padding; must not affect valid frames

    enc = BiLSTMEncoder(num_layers=layers, hidden=H)
    params = enc.init(
        jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(lens)
    )["params"]
    out = np.asarray(
        enc.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens))
    )

    raw = _unbox(params)

    def p(name):
        sub = raw[name]
        return (
            np.asarray(sub["wx"]),
            np.asarray(sub["wh"]),
            np.asarray(sub["b"]),
        )

    for r in range(B):
        h = x[r, : lens[r]]
        for layer in range(layers):
            h = lstm_oracle.bilstm_forward(
                h, p(f"fwd_{layer}"), p(f"bwd_{layer}")
            )
        np.testing.assert_allclose(
            out[r, : lens[r]], h, atol=1e-4, rtol=1e-4
        )
        # Padded positions are zeroed.
        assert np.all(out[r, lens[r]:] == 0.0)


def test_fused_scan_matches_two_scan_exactly():
    """FusedBiLSTMLayer (one scan, [2,B,H] carry) must equal the two-scan
    encoder bit-for-bit-ish when its stacked weights are copied into the
    per-direction layers — same math, fewer sequential dispatches."""
    rng = np.random.default_rng(3)
    B, T, D, H, layers = 4, 15, 6, 8, 2
    lens = np.asarray([15, 11, 7, 1], np.int32)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    for r, n in enumerate(lens):
        x[r, n:] = -7.0  # poison padding

    fused = BiLSTMEncoder(num_layers=layers, hidden=H, fused_scan=True)
    fparams = fused.init(
        jax.random.PRNGKey(5), jnp.asarray(x), jnp.asarray(lens)
    )["params"]
    out_fused = np.asarray(
        fused.apply({"params": fparams}, jnp.asarray(x), jnp.asarray(lens))
    )

    # Rebuild the two-scan param tree from the stacked weights.
    raw = _unbox(fparams)
    two = {}
    for layer in range(layers):
        sub = raw[f"bi_{layer}"]
        for d, name in ((0, f"fwd_{layer}"), (1, f"bwd_{layer}")):
            two[name] = {
                "wx": jnp.asarray(np.asarray(sub["wx"])[d]),
                "wh": jnp.asarray(np.asarray(sub["wh"])[d]),
                "b": jnp.asarray(np.asarray(sub["b"])[d]),
            }
    unfused = BiLSTMEncoder(num_layers=layers, hidden=H, fused_scan=False)
    out_two = np.asarray(
        unfused.apply({"params": two}, jnp.asarray(x), jnp.asarray(lens))
    )
    np.testing.assert_allclose(out_fused, out_two, atol=1e-6, rtol=1e-6)


def test_fused_scan_trains():
    """The fused-scan preset path trains end-to-end (overfits a batch)."""
    import dataclasses

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.training import Trainer

    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        warmup_steps=2,
        lr=3e-3,
        model=dataclasses.replace(
            CONFIG1.model, num_layers=1, hidden=128, bilstm_fused_scan=True
        ),
    )
    tr = Trainer(cfg)
    batch = next(iter(tr.loader.epoch(0)))
    first = None
    for _ in range(30):
        m = tr.train_batch(batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last) and last < 0.5 * first, (first, last)


def test_frame_stack_trains_and_lengths():
    """frame_stack=3: 3x fewer recurrence steps; lengths = ceil(T/3); the
    stacked model still overfits a batch (Sak et al. 2015 frame stacking)."""
    import dataclasses

    import numpy as np

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.training import Trainer

    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        warmup_steps=2,
        lr=3e-3,
        model=dataclasses.replace(
            CONFIG1.model, num_layers=1, hidden=128, frame_stack=3
        ),
    )
    tr = Trainer(cfg)
    batch = next(iter(tr.loader.epoch(0)))
    first = None
    for _ in range(30):
        m = tr.train_batch(batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last) and last < 0.5 * first, (first, last)
    # Length contract: ceil(feat_lens / 3).
    lens = np.asarray([1, 2, 3, 4, 301])
    got = cfg.model.output_lens(lens)
    np.testing.assert_array_equal(got, [1, 1, 1, 2, 101])
