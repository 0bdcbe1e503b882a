"""Pallas CTC kernel parity vs the XLA-scan implementation (which is itself
pinned against the numpy oracle and tf.nn.ctc_loss in test_ctc_loss.py).

Covers loss values AND gradients across edge cases: variable input/label
lengths, empty labels, repeated labels (skip-transition rules), infeasible
rows (T < 2L+1), and full-batch jit composition.  Off-TPU the kernels run
in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralasr_tpu.ctc.loss import ctc_loss


def _case(seed, B, T, V, L, input_lens, label_lens, repeat_heavy=False):
    rng = np.random.default_rng(seed)
    logits = (rng.normal(size=(B, T, V)) * 2.0).astype(np.float32)
    if repeat_heavy:
        labels = rng.integers(1, 3, size=(B, L)).astype(np.int32)
    else:
        labels = rng.integers(1, V, size=(B, L)).astype(np.int32)
    return (
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(input_lens, jnp.int32),
        jnp.asarray(label_lens, jnp.int32),
    )


CASES = [
    _case(0, 4, 20, 6, 5, [20, 15, 9, 20], [5, 3, 1, 4]),
    _case(1, 3, 12, 5, 4, [12, 12, 7], [0, 4, 2]),  # empty-label row
    _case(2, 4, 18, 4, 6, [18, 10, 18, 5], [6, 5, 6, 2], repeat_heavy=True),
    _case(3, 2, 8, 5, 6, [8, 8], [6, 6]),  # near/at the feasibility edge
    _case(4, 2, 6, 5, 6, [6, 4], [6, 6]),  # infeasible rows (T < L)
]


@pytest.mark.parametrize("impl", ["pallas", "pallas_stream"])
@pytest.mark.parametrize("case", CASES)
def test_pallas_matches_scan_loss_and_grad(case, impl):
    logits, labels, il, ll = case

    def loss_sum(impl):
        def f(lg):
            per = ctc_loss(lg, labels, il, ll, impl=impl)
            return jnp.where(per > 1e29, 0.0, per).sum()

        return f

    a = ctc_loss(logits, labels, il, ll, impl="scan")
    b = ctc_loss(logits, labels, il, ll, impl=impl)
    feasible = np.asarray(a) < 1e29
    np.testing.assert_allclose(
        np.asarray(a)[feasible], np.asarray(b)[feasible],
        rtol=1e-5, atol=1e-5,
    )
    # Infeasible rows must be hugely positive in both.
    assert np.all(np.asarray(b)[~feasible] > 1e29)

    ga = jax.grad(loss_sum("scan"))(logits)
    gb = jax.grad(loss_sum(impl))(logits)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("impl", ["pallas", "pallas_stream"])
def test_pallas_inside_jit_value_and_grad(impl):
    logits, labels, il, ll = CASES[0]

    @jax.jit
    def f(lg):
        per = ctc_loss(lg, labels, il, ll, impl=impl)
        return jnp.where(per > 1e29, 0.0, per).mean()

    v, g = jax.value_and_grad(f)(logits)
    per_scan = ctc_loss(logits, labels, il, ll, impl="scan")
    want = float(jnp.where(per_scan > 1e29, 0.0, per_scan).mean())
    np.testing.assert_allclose(float(v), want, rtol=1e-5)
    assert np.isfinite(np.asarray(g)).all()


def test_trainer_ctc_impl_knob():
    """cfg.ctc_impl='pallas' trains (overfits a batch) end-to-end."""
    import dataclasses

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.training import Trainer

    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        warmup_steps=2,
        lr=3e-3,
        ctc_impl="pallas",
        model=dataclasses.replace(CONFIG1.model, num_layers=1, hidden=96),
    )
    tr = Trainer(cfg)
    batch = next(iter(tr.loader.epoch(0)))
    first = float(tr.train_batch(batch)["loss"])
    for _ in range(25):
        m = tr.train_batch(batch)
    last = float(m["loss"])
    assert np.isfinite(last) and last < 0.5 * first, (first, last)
