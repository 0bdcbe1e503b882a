"""Distributed assertions run in a subprocess with 8 fake CPU devices
(tests/test_distributed.py spawns this; SURVEY.md §5.3).

Checks:
1. DP (8-device mesh) train step loss == single-device loss.
2. TP (model_axis=2) forward == unsharded forward — WITH the Pallas
   fused-attention kernel (custom_partitioning; interpret mode on CPU).
3. Loader: global batch composition independent of process_count.
4. dryrun_multichip(8) runs (the driver's contract: full config-5
   geometry, Pallas attention, TP==single equality).
5. Beam-search decode jit'd under the sharded mesh == single-device
   (SURVEY.md §4.5: decode under the mesh).

TRUE multi-process checks (jax.process_count() > 1) live in
tests/multiprocess_check.py.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuralasr_tpu.configs import CONFIG1
from neuralasr_tpu.training import Trainer
from neuralasr_tpu.parallel.mesh import make_mesh
from neuralasr_tpu.data import SyntheticCorpus, BucketedLoader
from neuralasr_tpu.data.buckets import default_buckets


def check_dp_matches_single():
    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        model=dataclasses.replace(CONFIG1.model, num_layers=1, hidden=64),
    )
    devs = jax.devices("cpu")
    tr1 = Trainer(cfg, mesh=make_mesh(1, devices=devs[:1]))
    tr8 = Trainer(cfg, mesh=make_mesh(8, devices=devs))
    batch = next(
        b for b in tr1.loader.epoch(0) if b.wav.shape[0] % 8 == 0
    )
    m1 = tr1.train_batch(batch)
    m8 = tr8.train_batch(batch)
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-4)
    np.testing.assert_allclose(m1["grad_norm"], m8["grad_norm"], rtol=1e-3)
    # Second step: params must have updated identically.
    m1b = tr1.train_batch(batch)
    m8b = tr8.train_batch(batch)
    np.testing.assert_allclose(m1b["loss"], m8b["loss"], rtol=1e-4)
    print("ok dp_matches_single")


def check_tp_matches_unsharded():
    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        model_axis=2,
        model=dataclasses.replace(
            CONFIG1.model,
            encoder_type="conformer",
            num_layers=2,
            hidden=64,
            num_heads=4,
            use_pallas_attention=True,  # partitions via custom_partitioning
            pallas_attn_min_t=0,  # force the kernel at this tiny T
        ),
    )
    devs = jax.devices("cpu")
    tr_tp = Trainer(cfg, mesh=make_mesh(8, model_axis=2, devices=devs))
    cfg1 = dataclasses.replace(cfg, model_axis=1)
    tr_1 = Trainer(cfg1, mesh=make_mesh(1, devices=devs[:1]))
    batch = next(
        b for b in tr_1.loader.epoch(0) if b.wav.shape[0] % 4 == 0
    )
    m_tp = tr_tp.train_batch(batch)
    m_1 = tr_1.train_batch(batch)
    np.testing.assert_allclose(m_1["loss"], m_tp["loss"], rtol=1e-4)
    print("ok tp_matches_unsharded")


def check_tp_xla_attention_matches_unsharded():
    """ADVICE r3: the production multichip path for SHORT buckets — XLA
    einsum attention under a sharded mesh (use_pallas on, T below the
    default attn_min_t threshold) — needs its own TP-vs-unsharded parity
    case; the kernel-forced case above does not cover it."""
    cfg = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        model_axis=2,
        model=dataclasses.replace(
            CONFIG1.model,
            encoder_type="conformer",
            num_layers=2,
            hidden=64,
            num_heads=4,
            use_pallas_attention=True,
            pallas_attn_min_t=512,  # tiny T -> XLA attention under the mesh
        ),
    )
    devs = jax.devices("cpu")
    tr_tp = Trainer(cfg, mesh=make_mesh(8, model_axis=2, devices=devs))
    cfg1 = dataclasses.replace(cfg, model_axis=1)
    tr_1 = Trainer(cfg1, mesh=make_mesh(1, devices=devs[:1]))
    batch = next(
        b for b in tr_1.loader.epoch(0) if b.wav.shape[0] % 4 == 0
    )
    m_tp = tr_tp.train_batch(batch)
    m_1 = tr_1.train_batch(batch)
    np.testing.assert_allclose(m_1["loss"], m_tp["loss"], rtol=1e-4)
    print("ok tp_xla_attention_matches_unsharded")


def check_ctc_stream_under_mesh():
    """Round 4: the streaming CTC kernels are custom_partitioned over the
    batch — loss and grads under an 8-device 'data' mesh must equal the
    single-device scan implementation."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuralasr_tpu.ctc.loss import ctc_loss

    rng = np.random.default_rng(3)
    B, T, V, L = 16, 60, 29, 18
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32)) * 2.0
    labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
    il = jnp.asarray(rng.integers(40, T + 1, size=(B,)), jnp.int32)
    ll = jnp.asarray(rng.integers(1, L + 1, size=(B,)), jnp.int32)

    def loss_sum(lg, impl):
        per = ctc_loss(lg, labels, il, ll, impl=impl)
        return jnp.where(per > 1e29, 0.0, per).sum()

    want_v, want_g = jax.value_and_grad(
        partial(loss_sum, impl="scan"))(logits)

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    lg_sh = jax.device_put(logits, NamedSharding(mesh, P("data", None, None)))
    labels_sh = jax.device_put(labels, sh)  # noqa: F841 (captured consts ok)
    got_v, got_g = jax.jit(
        jax.value_and_grad(partial(loss_sum, impl="pallas_stream"))
    )(lg_sh)
    np.testing.assert_allclose(float(want_v), float(got_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(want_g), np.asarray(got_g), rtol=1e-4, atol=1e-5
    )
    print("ok ctc_stream_under_mesh")


def check_conv_pallas_under_mesh():
    """Round 5: the fused conv-module kernel is custom_partitioned over
    the batch (weight grads psum'd inside the partitioned backward) —
    loss and EVERY grad under an 8-device 'data' mesh must equal the
    single-device jnp reference."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuralasr_tpu.ops.pallas_conv import _conv_ref, fused_conv_module

    rng = np.random.default_rng(11)
    B, T, d, K = 16, 24, 256, 15
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(8, T + 1, size=(B,)), jnp.int32)
    params = [
        jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
        for s in [(d,), (d,), (d, 2 * d), (2 * d,), (K, d), (d,), (d,),
                  (d,), (d, d), (d,)]
    ]

    def loss(fn, x, *ps):
        return (fn(x, lens, *ps) ** 2).sum()

    want_v, want_g = jax.value_and_grad(
        lambda *a: loss(_conv_ref, *a), argnums=tuple(range(11))
    )(x, *params)

    mesh = make_mesh(8)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got_v, got_g = jax.jit(
        jax.value_and_grad(
            lambda *a: loss(fused_conv_module, *a), argnums=tuple(range(11))
        )
    )(x_sh, *params)
    np.testing.assert_allclose(float(want_v), float(got_v), rtol=2e-4)
    for w, g in zip(want_g, got_g):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=2e-3, atol=2e-4
        )
    print("ok conv_pallas_under_mesh")


def check_loader_host_invariance():
    corpus = SyntheticCorpus(24, seed=3)
    buckets = default_buckets(8)
    single = BucketedLoader(corpus, buckets, seed=7)
    p0 = BucketedLoader(corpus, buckets, seed=7, process_index=0, process_count=2)
    p1 = BucketedLoader(corpus, buckets, seed=7, process_index=1, process_count=2)
    assert single.plan(0) == p0.plan(0) == p1.plan(0)
    b_all = next(iter(single.epoch(0)))
    b0 = next(iter(p0.epoch(0)))
    b1 = next(iter(p1.epoch(0)))
    bs = b_all.wav.shape[0]
    half = bs // 2
    np.testing.assert_array_equal(b_all.wav[:half], b0.wav[:half])
    np.testing.assert_array_equal(b_all.wav[half:], b1.wav[half:])
    np.testing.assert_array_equal(b_all.labels[:half], b0.labels[:half])
    np.testing.assert_array_equal(b_all.labels[half:], b1.labels[half:])
    print("ok loader_host_invariance")


def check_beam_under_mesh():
    """Beam-search decode jit'd under the 8-device mesh, inputs sharded
    over 'data', must produce the single-device prefixes/lens exactly."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuralasr_tpu.ctc.beam import beam_search_decode

    rng = np.random.default_rng(11)
    B, T, V, W, L = 8, 40, 29, 8, 32
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32)) * 2.0
    lens = jnp.asarray(rng.integers(10, T + 1, size=(B,)), jnp.int32)

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    fn = partial(beam_search_decode, beam_width=W, max_label_len=L)
    pref_m, lens_m, scores_m = jax.jit(fn, in_shardings=(sh, sh))(logits, lens)
    pref_1, lens_1, scores_1 = fn(logits, lens)
    np.testing.assert_array_equal(np.asarray(pref_m), np.asarray(pref_1))
    np.testing.assert_array_equal(np.asarray(lens_m), np.asarray(lens_1))
    np.testing.assert_allclose(
        np.asarray(scores_m), np.asarray(scores_1), rtol=1e-5
    )
    print("ok beam_under_mesh")


def check_resharding_restore():
    """Checkpoint saved from a model_axis=2 trainer restores into a
    model_axis=1 single-device trainer (and back), with identical
    next-step losses — the 'resharding-capable' claim of
    utils/checkpoint.py, previously untested (VERDICT.md r1 item 10)."""
    import shutil
    import tempfile

    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like

    devs = jax.devices("cpu")
    base = dataclasses.replace(
        CONFIG1,
        num_utterances=16,
        batch_size=8,
        model=dataclasses.replace(
            CONFIG1.model,
            encoder_type="conformer",
            num_layers=2,
            hidden=64,
            num_heads=4,
            use_pallas_attention=True,
            pallas_attn_min_t=0,  # force the kernel at this tiny T
        ),
    )
    tr_tp = Trainer(
        dataclasses.replace(base, model_axis=2),
        mesh=make_mesh(8, model_axis=2, devices=devs),
    )
    tr_1 = Trainer(
        dataclasses.replace(base, model_axis=1),
        mesh=make_mesh(1, devices=devs[:1]),
    )
    batch = next(
        b for b in tr_tp.loader.epoch(0) if b.wav.shape[0] % 4 == 0
    )
    # One step first so opt_state carries non-trivial moments.
    tr_tp.train_batch(batch)

    d = tempfile.mkdtemp()
    try:
        # TP(8 devices) -> single-device restore.
        ck = Checkpointer(os.path.join(d, "a"))
        ck.save(tr_tp.step, tr_tp.state, {"step": tr_tp.step})
        state, _ = ck.restore(abstract_like(tr_1.state))
        ck.close()
        tr_1.state, tr_1.step = state, tr_tp.step
        loss_tp = float(tr_tp.train_batch(batch)["loss"])
        loss_1 = float(tr_1.train_batch(batch)["loss"])
        np.testing.assert_allclose(loss_1, loss_tp, rtol=1e-4)

        # Single-device -> TP restore (the reverse resharding).
        ck = Checkpointer(os.path.join(d, "b"))
        ck.save(tr_1.step, tr_1.state, {"step": tr_1.step})
        state, _ = ck.restore(abstract_like(tr_tp.state))
        ck.close()
        tr_tp.state, tr_tp.step = state, tr_1.step
        loss_tp2 = float(tr_tp.train_batch(batch)["loss"])
        loss_12 = float(tr_1.train_batch(batch)["loss"])
        np.testing.assert_allclose(loss_tp2, loss_12, rtol=1e-4)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print("ok resharding_restore")


def check_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    print("ok dryrun_multichip")


if __name__ == "__main__":
    check_loader_host_invariance()
    check_dp_matches_single()
    check_tp_matches_unsharded()
    check_tp_xla_attention_matches_unsharded()
    check_ctc_stream_under_mesh()
    check_conv_pallas_under_mesh()
    check_beam_under_mesh()
    check_resharding_restore()
    check_dryrun()
    print("ALL-DISTRIBUTED-OK")
