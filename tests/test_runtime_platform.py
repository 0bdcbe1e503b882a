"""The Mosaic-vs-interpret decision must follow the devices being compiled
for, not the process's default backend (ops/runtime.py).

The failure this pins: a process whose default backend is the TPU (the axon
sitecustomize registers it into every interpreter on this box) builds a
fake-CPU mesh (__graft_entry__.dryrun_multichip).  With the old
`jax.default_backend() != "tpu"` gating every Pallas kernel picked Mosaic
and CPU lowering died with "Only interpret mode is supported on CPU
backend".  Now the Trainer pins ops.runtime to its mesh's platform.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neuralasr_tpu.ops import runtime


def test_override_wins_over_default_backend(monkeypatch):
    # Any earlier test that built a Trainer left the process-wide pin set
    # (that is its designed lifetime); this test needs the heuristic path.
    runtime.set_compute_platform(None)
    # Simulate the axon case: default backend claims "tpu".
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert runtime.on_tpu()  # heuristic follows the (lying) default
    try:
        runtime.set_compute_platform("cpu")
        assert not runtime.on_tpu()  # the pinned platform wins
        runtime.set_compute_platform("tpu")
        assert runtime.on_tpu()
    finally:
        runtime.set_compute_platform(None)
    monkeypatch.undo()
    assert runtime.on_tpu() == (jax.default_backend() == "tpu")


def test_kernel_runs_interpret_under_lying_default_backend(monkeypatch):
    # With the default backend lying "tpu" but the platform pinned to cpu,
    # a Pallas kernel must still lower (interpret mode) and agree with the
    # scan reference — the exact dryrun-on-fake-devices configuration.
    from neuralasr_tpu.ctc.loss import ctc_loss

    rng = np.random.default_rng(0)
    B, T, L, V = 2, 12, 4, 29
    logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
    il = jnp.full((B,), T, jnp.int32)
    ll = jnp.full((B,), L, jnp.int32)
    want = ctc_loss(logits, labels, il, ll, impl="scan")

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        runtime.set_compute_platform("cpu")
        got = ctc_loss(logits, labels, il, ll, impl="pallas")
    finally:
        runtime.set_compute_platform(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_trainer_pins_mesh_platform():
    import dataclasses

    from neuralasr_tpu.configs import CONFIG1
    from neuralasr_tpu.parallel.mesh import make_mesh
    from neuralasr_tpu.training import Trainer

    cfg = dataclasses.replace(
        CONFIG1, num_utterances=4, batch_size=2, cache_dir=""
    )
    try:
        Trainer(cfg, mesh=make_mesh(1, devices=jax.devices("cpu")[:1]))
        assert runtime._FORCED == "cpu"
    finally:
        runtime.set_compute_platform(None)
