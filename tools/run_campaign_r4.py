"""Round-4 measurement campaign A (one process = one axon chip claim).

Stages, in order (all results appended to runs/bench_suite.jsonl as r4a_*
rows plus runs/attn_crossover_r4.json / runs/ctc_micro_r4.json):

  preflight  compile+numerics of the NEW kernels on the live backend:
             rope-fused G-folded attention fwd+bwd (short AND long T),
             streaming CTC fwd+bwd, frontend block 384/512 + bf16 acc.
  ladder     attention crossover: 12-call chained stacks of the Pallas
             kernel vs XLA einsum attention, fwd and fwd+bwd, at constant
             tokens (64,240)->(8,1920).  Honest timing per the axon rules:
             N queued dispatches then one device_get sync; the 12-chain
             amortizes the ~2 ms per-dispatch tunnel overhead.
  ctc        micro A/B of scan vs pallas vs pallas_stream (8-fold summed
             losses for the same amortization) + step-level bench rows.
  frontend   block 256/384/512 x f32/bf16-acc step rows (breakdown carries
             the frontend stage ms).
  beam       prune_k A/B at widths 16 and 64.
  headline   bench row at the measured-best settings.
  trace      encoder_trace capture+attribution at the winning attention
             setting (the <5% unattributed check, VERDICT r3 item 3).

Usage: python tools/run_campaign_r4.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_campaign2 import bench_once

RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runs")


# ---------------- honest chained timing ----------------


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    # Fetch ONE element, not the array: np.asarray(leaf) pulls the whole
    # buffer over the ~45 MB/s tunnel (the first r4a ladder's fwd rows were
    # inflated ~1.1 ms/call by an 11.8 MB fetch amortized over the loop).
    return jax.device_get(leaf.ravel()[0])


def timeit_chain(fn, args, iters=20):
    """Queue `iters` dispatches, then force one real sync (device_get);
    block_until_ready does NOT fence on the axon backend."""
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


# ---------------- preflights ----------------


def preflight_attention() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.ops.pallas_attention import (
        _attention_ref,
        flash_attention_local_rope,
        rope_tables,
    )

    out = {}
    for tag, (B, T) in (("short", (16, 240)), ("long", (4, 1920))):
        try:
            rng = np.random.default_rng(0)
            H, D = 6, 64
            q, k, v, g = (
                jnp.asarray(
                    rng.normal(size=(B, T, H, D)).astype(np.float32)
                ).astype(jnp.bfloat16)
                for _ in range(4)
            )
            lens = jnp.asarray(
                rng.integers(T // 2, T + 1, size=(B,)), jnp.int32
            )
            cos, sin = rope_tables(T, D)

            def f(q, k, v):
                o = flash_attention_local_rope(q, k, v, lens, cos, sin)
                return (o.astype(jnp.float32) * g.astype(jnp.float32)).sum()

            val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
                q, k, v
            )
            want = (
                _attention_ref(
                    q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32), lens, cos, sin,
                )
                * g.astype(jnp.float32)
            ).sum()
            rel = abs(float(val) - float(want)) / max(1.0, abs(float(want)))
            finite = all(
                bool(jnp.isfinite(x.astype(jnp.float32)).all())
                for x in grads
            )
            out[tag] = {"ok": bool(rel < 0.05 and finite), "rel": rel}
        except Exception:
            out[tag] = {"ok": False, "error": traceback.format_exc()[-800:]}
        print(f"[preflight] attention {tag}: {out[tag]}", flush=True)
    return out


def preflight_ctc_stream() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.ctc.loss import ctc_loss

    try:
        rng = np.random.default_rng(0)
        B, T, V, L = 16, 100, 29, 30
        logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
        il = jnp.asarray(rng.integers(70, T + 1, size=(B,)), jnp.int32)
        ll = jnp.asarray(rng.integers(1, L + 1, size=(B,)), jnp.int32)

        def f(lg, impl):
            per = ctc_loss(lg, labels, il, ll, impl=impl)
            return jnp.where(per > 1e29, 0.0, per).sum()

        v1, g1 = jax.jit(
            jax.value_and_grad(lambda lg: f(lg, "pallas_stream"))
        )(logits)
        want = float(f(logits, "scan"))
        gw = jax.grad(lambda lg: f(lg, "scan"))(logits)
        ok = (
            abs(float(v1) - want) < 1e-2 * max(1.0, abs(want))
            and bool(jnp.isfinite(g1).all())
            and float(jnp.abs(g1 - gw).max()) < 1e-2
        )
        res = {"ok": bool(ok), "v": float(v1), "want": want}
    except Exception:
        res = {"ok": False, "error": traceback.format_exc()[-800:]}
    print(f"[preflight] ctc_stream: {res}", flush=True)
    return res


def preflight_frontend_variants() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.features.frontend import FeatureConfig, make_frontend

    out = {}
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(4, 16000 * 4)) * 1000).astype(np.float32)
    lens = np.full((4,), 16000 * 4, np.int32)
    base = FeatureConfig(
        feature_type="logmel", n_mels=80, use_pallas=True,
        compute_dtype="bfloat16",
    )
    import dataclasses

    ref_fn = make_frontend(
        dataclasses.replace(base, use_pallas=False), 398
    )
    ref, _ = ref_fn(jnp.asarray(wav), jnp.asarray(lens))
    for tag, over in (
        ("b256_f32", {}),
        ("b384_f32", {"pallas_block_frames": 384}),
        ("b512_f32", {"pallas_block_frames": 512}),
        # bf16 acc kept in the preflight as the recorded viability check —
        # it FAILS (max_err ~6.7: catastrophic cancellation in the DFT
        # partial sums once rounded to bf16), which is the measured answer
        # to the VERDICT r3 item-6 "bf16 DFT intermediate" question.
        ("b256_bf16acc", {"pallas_dft_acc": "bfloat16"}),
    ):
        try:
            fn = make_frontend(dataclasses.replace(base, **over), 398)
            got, _ = fn(jnp.asarray(wav), jnp.asarray(lens))
            err = float(jnp.abs(got - ref).max())
            out[tag] = {"ok": bool(err < 0.25), "max_err": err}
        except Exception:
            out[tag] = {"ok": False, "error": traceback.format_exc()[-500:]}
        print(f"[preflight] frontend {tag}: {out[tag]}", flush=True)
    return out


# ---------------- attention crossover ladder ----------------


def attn_ladder(nstack: int = 12, iters: int = 20) -> list[dict]:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.ops.pallas_attention import (
        apply_rope,
        flash_attention_local_rope,
        rope_tables,
    )

    H, D = 6, 64
    NEG = -1e30
    rows = []
    for B, T in ((64, 240), (32, 480), (16, 960), (8, 1920)):
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(
            rng.normal(size=(B, T, H, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
        cos, sin = rope_tables(T, D)
        mask = jnp.arange(T)[None, :] < lens[:, None]

        def xla_attn(qq, kk, vv):
            qq = apply_rope(qq, cos, sin)
            kk = apply_rope(kk, cos, sin)
            scale = 1.0 / jnp.sqrt(jnp.asarray(D, qq.dtype))
            logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk) * scale
            logits = jnp.where(
                mask[:, None, None, :], logits, jnp.asarray(NEG, logits.dtype)
            )
            attn = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", attn, vv)

        def pallas_attn(qq, kk, vv):
            return flash_attention_local_rope(qq, kk, vv, lens, cos, sin)

        for name, attn in (("pallas", pallas_attn), ("xla", xla_attn)):
            # 12-call chain (data-dependent, so the chip serializes them and
            # per-call cost = total / nstack with ONE dispatch per stack).
            def stack(qq, kk, vv):
                x = qq
                for _ in range(nstack):
                    x = attn(x, kk, vv) + qq
                return x

            def stack_loss(qq, kk, vv):
                return stack(qq, kk, vv).astype(jnp.float32).sum()

            row = {"B": B, "T": T, "impl": name, "nstack": nstack}
            try:
                fwd = jax.jit(stack)
                row["fwd_ms_per_call"] = round(
                    timeit_chain(fwd, (q, k, v), iters) / nstack * 1e3, 4
                )
                fb = jax.jit(jax.value_and_grad(stack_loss, argnums=(0,)))
                row["fwdbwd_ms_per_call"] = round(
                    timeit_chain(fb, (q, k, v), iters) / nstack * 1e3, 4
                )
            except Exception:
                row["error"] = traceback.format_exc()[-500:]
            rows.append(row)
            print(f"[ladder] {row}", flush=True)
    with open(os.path.join(RUNS, "attn_crossover_r4.json"), "w") as f:
        json.dump(rows, f, indent=2)
    return rows


# ---------------- CTC micro ----------------


def ctc_micro(iters: int = 20) -> list[dict]:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuralasr_tpu.ctc.loss import ctc_loss

    rows = []
    for B, T, L in ((64, 240, 80), (32, 480, 160)):
        rng = np.random.default_rng(0)
        V = 29
        logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
        il = jnp.full((B,), T, jnp.int32)
        ll = jnp.full((B,), L, jnp.int32)
        NFOLD = 8
        for impl in ("scan", "pallas", "pallas_stream"):

            def f(lg, _impl=impl):
                tot = 0.0
                for i in range(NFOLD):
                    per = ctc_loss(
                        lg + 0.001 * i, labels, il, ll, impl=_impl
                    )
                    tot = tot + jnp.where(per > 1e29, 0.0, per).sum()
                return tot

            row = {"B": B, "T": T, "S": 2 * L + 1, "impl": impl}
            try:
                fwd = jax.jit(f)
                row["fwd_ms"] = round(
                    timeit_chain(fwd, (logits,), iters) / NFOLD * 1e3, 4
                )
                fb = jax.jit(jax.value_and_grad(f))
                row["fwdbwd_ms"] = round(
                    timeit_chain(fb, (logits,), iters) / NFOLD * 1e3, 4
                )
            except Exception:
                row["error"] = traceback.format_exc()[-500:]
            rows.append(row)
            print(f"[ctc_micro] {row}", flush=True)
    with open(os.path.join(RUNS, "ctc_micro_r4.json"), "w") as f:
        json.dump(rows, f, indent=2)
    return rows


# ---------------- stages ----------------


def stage_preflight():
    res = {
        "attention": preflight_attention(),
        "ctc_stream": preflight_ctc_stream(),
        "frontend": preflight_frontend_variants(),
    }
    with open(os.path.join(RUNS, "preflight_r4.json"), "w") as f:
        json.dump(res, f, indent=2)
    return res


def stage_bench_ab():
    rows = {}
    # Attention policy A/B at the headline point (step-level truth).
    rows["attn_kernel"] = bench_once(
        "r4a_attn_kernel_b64", ["--attn-min-t", "0"]
    )
    rows["attn_xla"] = bench_once(
        "r4a_attn_xla_b64", ["--attn-min-t", "100000"]
    )
    # CTC impls under the better attention setting are compared on equal
    # defaults (threshold 512 still routes T=240 to XLA; the A/B above is
    # what decides the new default).
    rows["ctc_scan"] = bench_once("r4a_ctc_scan", [])
    rows["ctc_stream"] = bench_once(
        "r4a_ctc_stream", ["--ctc-impl", "pallas_stream"]
    )
    return rows


def stage_frontend():
    rows = {}
    # bf16 DFT accumulation is numerically unviable (CPU preflight:
    # max_err 6.7 on CMVN'd features — catastrophic cancellation in the
    # high-bin DFT sums), so the sweep is block sizes only; the knob stays
    # for the record.
    for tag, argv in (
        ("b384", ["--frontend-block", "384"]),
        ("b512", ["--frontend-block", "512"]),
    ):
        rows[tag] = bench_once(f"r4a_frontend_{tag}", argv)
    return rows


def stage_beam():
    rows = {}
    for tag, argv in (
        ("w16_prune", ["--beam-prune-k", "-1", "--no-breakdown"]),
        ("w64_noprune", ["--beam-width", "64", "--no-breakdown"]),
        ("w64_prune", ["--beam-width", "64", "--beam-prune-k", "-1",
                       "--no-breakdown"]),
    ):
        rows[tag] = bench_once(f"r4a_beam_{tag}", argv)
    return rows


def stage_headline(extra=()):
    return bench_once("r4a_headline", list(extra))


def stage_trace(attn_min_t: int | None = None):
    import tools.encoder_trace as et

    old = sys.argv
    sys.argv = ["encoder_trace.py"]
    if attn_min_t is not None:
        sys.argv += ["--attn-min-t", str(attn_min_t)]
    try:
        et.main()
    finally:
        sys.argv = old


def main():
    stages = sys.argv[1:] or [
        "preflight", "ladder", "ctc", "bench", "frontend", "beam", "trace",
    ]
    failures = []
    t0 = time.time()
    for st in stages:
        print(f"==== stage {st} ({time.time() - t0:.0f}s) ====", flush=True)
        try:
            if st == "preflight":
                stage_preflight()
            elif st == "ladder":
                attn_ladder()
            elif st == "ctc":
                ctc_micro()
            elif st == "bench":
                stage_bench_ab()
            elif st == "frontend":
                stage_frontend()
            elif st == "beam":
                stage_beam()
            elif st == "headline":
                stage_headline()
            elif st == "trace":
                stage_trace()
        except Exception:
            failures.append((st, traceback.format_exc()[-1500:]))
            print(f"[campaign] stage {st} FAILED", flush=True)
    print(json.dumps({"failures": failures}), flush=True)
    print("CAMPAIGN-R4A-DONE", flush=True)


if __name__ == "__main__":
    main()
