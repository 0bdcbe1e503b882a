"""Intra-encoder roofline attribution for the conformer block.

VERDICT r2 item 2 / BASELINE r3 "mfu target accounting" left the encoder
itself as the remaining gap to mfu 0.40: fwd+bwd runs at ~0.36-0.37
flops-util and the LN/GLU/depthwise-conv glue around the matmuls was
estimated (not measured) at ~25-30 % of cycles.  This tool measures it:
each conformer submodule (ff1-style FeedForward, MHSA with the Pallas
kernel, ConvModule, final LayerNorm) is timed standalone at the bench
geometry (fwd and fwd+bwd), so the estimate becomes a number per module.

Standalone timings lose cross-module fusion context, so rows slightly
over-count shared HBM traffic; the ranking is what matters.

Usage:  python tools/encoder_breakdown.py [--batch 64] [--frames 240]
Writes one JSON line per module to stdout and runs/encoder_breakdown.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters=30):
    jax.block_until_ready(fn(*args))  # compile
    jax.block_until_ready(fn(*args))  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run a single module (rows measured in separate "
                         "processes don't pollute each other's timings — "
                         "the Pallas attention row was observed to leave "
                         "the axon queue ~24 ms slow for later rows)")
    args = ap.parse_args()

    from neuralasr_tpu.models.conformer import (
        ConformerBlock,
        ConvModule,
        FeedForward,
        MHSA,
    )
    import flax.linen as nn

    B, T, D = args.batch, args.frames, args.dim
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = on_tpu and not args.no_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype)
    mask = jnp.ones((B, T), bool)

    mods = {
        "feedforward": (FeedForward(D, 4, 0.0, dtype), lambda m, p, x: m.apply(p, x, train=False)),
        "mhsa": (
            MHSA(D, args.heads, 0.0, use_pallas, False, dtype),
            lambda m, p, x: m.apply(p, x, mask, train=False),
        ),
        "convmodule": (
            ConvModule(D, 15, 0.0, dtype),
            lambda m, p, x: m.apply(p, x, mask, train=False),
        ),
        "layernorm": (nn.LayerNorm(dtype=dtype), lambda m, p, x: m.apply(p, x)),
        "full_block": (
            ConformerBlock(D, args.heads, 4, 15, 0.0, use_pallas, False, dtype),
            lambda m, p, x: m.apply(p, x, mask, train=False),
        ),
    }

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "runs", "encoder_breakdown.jsonl")
    rows = []
    for name, (mod, apply_fn) in mods.items():
        if args.only and name != args.only:
            continue
        if name == "mhsa":
            params = mod.init(jax.random.PRNGKey(0), x, mask, train=False)
        elif name == "convmodule":
            params = mod.init(jax.random.PRNGKey(0), x, mask, train=False)
        elif name == "full_block":
            params = mod.init(jax.random.PRNGKey(0), x, mask, train=False)
        elif name == "layernorm":
            params = mod.init(jax.random.PRNGKey(0), x)
        else:
            params = mod.init(jax.random.PRNGKey(0), x, train=False)

        fwd = jax.jit(lambda p, x, m=mod, f=apply_fn: f(m, p, x))

        def loss(p, x, m=mod, f=apply_fn):
            return (f(m, p, x).astype(jnp.float32) ** 2).mean()

        fwdbwd = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        ms_f = timeit(fwd, (params, x))
        ms_fb = timeit(fwdbwd, (params, x))
        row = {
            "module": name,
            "fwd_ms": round(ms_f, 3),
            "fwd_bwd_ms": round(ms_fb, 3),
            "x12_fwd_bwd_ms": round(ms_fb * 12, 2),
            "batch": B,
            "frames": T,
            "dim": D,
            "dtype": args.dtype,
            "pallas_attention": use_pallas,
            "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(out_path, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
