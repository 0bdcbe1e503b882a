"""Which platform are the Pallas kernels compiling for?

Every kernel in this package picks Mosaic vs interpret mode per call via
`on_tpu()`.  The default — `jax.default_backend() == "tpu"` — is right for
every single-platform process, but wrong in one real configuration: a
process whose default backend is the TPU (the axon sitecustomize registers
it into every interpreter) asked to lower a program for CPU devices, e.g.
`__graft_entry__.dryrun_multichip` building a fake-CPU mesh while the
tunnel client is registered.  There `default_backend()` says "tpu", the
kernels pick Mosaic, and CPU lowering fails with "Only interpret mode is
supported on CPU backend".

`set_compute_platform(platform)` pins the decision to the platform of the
devices actually in the mesh; passing None restores the default-backend
heuristic.  Process-wide (not a contextvar): the override is set by
entry-point code that owns the whole process (the dryrun, a Trainer bound
to an explicit mesh), and kernels trace under jit where context locals
would not propagate anyway.
"""

from __future__ import annotations

_FORCED: str | None = None


def set_compute_platform(platform: str | None) -> None:
    """Pin kernel lowering to `platform` ("tpu"/"cpu"/...), or None to
    fall back to jax.default_backend()."""
    global _FORCED
    _FORCED = platform


def on_tpu() -> bool:
    if _FORCED is not None:
        return _FORCED == "tpu"
    import jax

    return jax.default_backend() == "tpu"
