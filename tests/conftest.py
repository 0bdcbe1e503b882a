"""Test harness: force unit tests onto XLA:CPU.

This machine's interpreter boots with an axon (remote TPU tunnel)
sitecustomize that calls jax.config.update("jax_platforms", "axon,cpu"),
overriding the JAX_PLATFORMS env var.  Unit tests must NOT run through the
tunnel: remote compiles are ~60x slower, MXU f32 matmul precision breaks
parity tolerances, and at least one scatter op deadlocks the tunnel.  So we
re-update the config here, before any backend is initialized (pytest loads
conftest before test modules).

Distributed tests (tests/test_distributed.py) get 8 fake CPU devices by
spawning subprocesses with XLA_FLAGS=--xla_force_host_platform_device_count=8
(SURVEY.md §5.3); forcing that flag process-wide on this 2-core box slows
every compile, so it stays scoped to those tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Keep TF (oracle tests) off any accelerator and quiet.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
