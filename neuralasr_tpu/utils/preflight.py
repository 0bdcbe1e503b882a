"""One-command silicon truth for every Pallas kernel family (VERDICT r4
item 6: round 3 shipped an unmeasured flagship kernel because compile+parity
proof lived in ad-hoc campaign scripts; this makes it structural).

`run_preflight()` compiles each kernel ON THE LIVE BACKEND (the real TPU
under axon; interpret mode on CPU still checks the numerics) and checks it
against its XLA/scan reference:

- fused rope attention fwd+bwd at the plan edges: the headline bucket
  (G-fold max, single q block), a non-multiple T (the q-block padding
  path), and the long-T shape whose backward working set sits at ~99.7 %
  of the VMEM budget (the near-budget plan edge) — plus the over-budget
  fallback guard (plan refuses, reference VJP takes over).
- streaming (zero-dispatch) AND grid CTC kernels at the lane-pad edge
  V=29 / S=161 (Mosaic requires 128-lane-aligned DMA chunk slices; the
  unpadded shapes were rejected on first r4 compile) and at a longer
  (T, S) point.
- framed Pallas frontend at block 256/384/512 f32, plus the recorded
  bf16-DFT-accumulator viability check (expected FAIL: catastrophic
  cancellation, BASELINE.md r4 — reported as ok_expected_fail).

bench.py --preflight runs this and writes runs/preflight_r{N}.json.
"""

from __future__ import annotations

import dataclasses
import traceback


def _rel_err(got: float, want: float) -> float:
    return abs(got - want) / max(1.0, abs(want))


def preflight_attention() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_attention as pa
    from ..ops.pallas_attention import (
        _attention_ref,
        _bwd_plan,
        _bwd_working_set,
        flash_attention_local_rope,
        rope_tables,
    )

    H, D = 6, 64
    shapes = {
        # Headline bucket: G-fold max (BH=384), one q block, no padding.
        "headline_64x240": (64, 240),
        # Non-multiple T: exercises the backward's T-padding path.
        "qpad_16x261": (16, 261),
        # Long T: bwd plan (2, 128) charges ~12.55 MB of the 12 MB budget
        # (99.7 %) — the near-budget plan edge on real VMEM.
        "budget_edge_8x1920": (8, 1920),
    }
    out = {}
    for tag, (B, T) in shapes.items():
        try:
            rng = np.random.default_rng(0)
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
            rel = _rel_err(float(val), float(want))
            finite = all(
                bool(jnp.isfinite(x.astype(jnp.float32)).all())
                for x in grads
            )
            plan = _bwd_plan(B * H, T, D, 2)
            out[tag] = {
                "ok": bool(rel < 0.05 and finite and plan is not None),
                "rel": round(rel, 5),
                "bwd_plan": list(plan) if plan else None,
                "bwd_vmem_frac": (
                    round(
                        _bwd_working_set(*plan, T, D, 2)
                        / pa._BWD_VMEM_BUDGET,
                        4,
                    )
                    if plan
                    else None
                ),
            }
        except Exception:
            out[tag] = {"ok": False, "error": traceback.format_exc()[-800:]}
        print(f"[preflight] attention {tag}: {out[tag]}", flush=True)
    # Over-budget fallback guard: the plan must refuse (the caller then
    # routes to the reference VJP instead of an over-VMEM Mosaic compile).
    refused = _bwd_plan(384, 8192, 64, 4) is None
    out["overbudget_refuses"] = {"ok": bool(refused)}
    print(f"[preflight] attention overbudget_refuses: {refused}", flush=True)
    return out


def preflight_ctc(impls=("pallas_stream", "pallas")) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..ctc.loss import ctc_loss

    out = {}
    # (B, T, L): S = 2L+1.  L=80 -> S=161 with V=29 is the Mosaic
    # lane-pad edge (neither a 128 multiple) that rejected the first r4
    # streaming compile; (32, 480, 160) is the longer ladder point.
    for tag, (B, T, L) in (
        ("lane_edge_64x240_s161", (64, 240, 80)),
        ("long_32x480_s321", (32, 480, 160)),
    ):
        rng = np.random.default_rng(0)
        V = 29
        logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, V, size=(B, L)), jnp.int32)
        il = jnp.asarray(rng.integers(3 * T // 4, T + 1, size=(B,)), jnp.int32)
        ll = jnp.asarray(rng.integers(1, L + 1, size=(B,)), jnp.int32)

        def f(lg, impl):
            per = ctc_loss(lg, labels, il, ll, impl=impl)
            return jnp.where(per > 1e29, 0.0, per).sum()

        want = float(jax.jit(lambda lg: f(lg, "scan"))(logits))
        gw = jax.jit(jax.grad(lambda lg: f(lg, "scan")))(logits)
        for impl in impls:
            try:
                v1, g1 = jax.jit(
                    jax.value_and_grad(lambda lg: f(lg, impl))
                )(logits)
                rel = _rel_err(float(v1), want)
                gerr = float(jnp.abs(g1 - gw).max())
                ok = rel < 1e-4 and bool(jnp.isfinite(g1).all()) and gerr < 1e-2
                out[f"{impl}_{tag}"] = {
                    "ok": bool(ok), "rel": round(rel, 7),
                    "grad_max_err": round(gerr, 6),
                }
            except Exception:
                out[f"{impl}_{tag}"] = {
                    "ok": False, "error": traceback.format_exc()[-800:]
                }
            print(
                f"[preflight] ctc {impl} {tag}: {out[f'{impl}_{tag}']}",
                flush=True,
            )
    return out


def preflight_frontend() -> dict:
    import numpy as np
    import jax.numpy as jnp

    from ..features.frontend import FeatureConfig, make_frontend

    out = {}
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(4, 16000 * 4)) * 1000).astype(np.float32)
    lens = np.full((4,), 16000 * 4, np.int32)
    base = FeatureConfig(
        feature_type="logmel", n_mels=80, use_pallas=True,
        compute_dtype="bfloat16",
    )
    ref_fn = make_frontend(dataclasses.replace(base, use_pallas=False), 398)
    ref, _ = ref_fn(jnp.asarray(wav), jnp.asarray(lens))
    for tag, over, expect_ok in (
        ("b256_f32", {}, True),
        ("b384_f32", {"pallas_block_frames": 384}, True),
        ("b512_f32", {"pallas_block_frames": 512}, True),
        # Recorded viability check — bf16 DFT partial sums cancel
        # catastrophically (max_err ~6.7, BASELINE.md r4); a PASS here
        # would mean the numerics changed and the knob needs re-review.
        ("b256_bf16acc", {"pallas_dft_acc": "bfloat16"}, False),
    ):
        try:
            fn = make_frontend(dataclasses.replace(base, **over), 398)
            got, _ = fn(jnp.asarray(wav), jnp.asarray(lens))
            err = float(jnp.abs(got - ref).max())
            passed = err < 0.25
            out[tag] = {
                "ok": bool(passed == expect_ok),
                "max_err": round(err, 4),
                **({} if expect_ok else {"expected_fail": True}),
            }
        except Exception:
            out[tag] = {
                "ok": not expect_ok,
                "error": traceback.format_exc()[-500:],
                **({} if expect_ok else {"expected_fail": True}),
            }
        print(f"[preflight] frontend {tag}: {out[tag]}", flush=True)
    return out


def preflight_conv_module() -> dict:
    """Fused conv-module kernel (round 5): compile + fwd/bwd parity vs the
    flax XLA ConvModule at the headline shape, bf16 and f32.  The risky
    Mosaic constructs are the K sublane-shifted slices of the depthwise
    conv and the constant-index-map weight-grad accumulation."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..models.conformer import ConvModule

    out = {}
    for tag, (B, T, dtype) in (
        ("headline_64x240_bf16", (64, 240, jnp.bfloat16)),
        ("f32_8x240", (8, 240, jnp.float32)),
    ):
        try:
            rng = np.random.default_rng(0)
            d = 384
            x = jnp.asarray(
                rng.normal(size=(B, T, d)).astype(np.float32)
            ).astype(dtype)
            lens = jnp.asarray(
                rng.integers(T // 2, T + 1, size=(B,)), jnp.int32
            )
            mask = jnp.arange(T)[None, :] < lens[:, None]
            g = jnp.asarray(
                rng.normal(size=(B, T, d)).astype(np.float32)
            ).astype(dtype)
            xla = ConvModule(d, 15, dtype=dtype, impl="xla")
            fused = ConvModule(d, 15, dtype=dtype, impl="pallas")
            params = xla.init(jax.random.PRNGKey(0), x, mask, False)["params"]

            def f(mod, p, xx):
                o = mod.apply({"params": p}, xx, mask, False)
                return (o.astype(jnp.float32) * g.astype(jnp.float32)).sum()

            want, gw = jax.jit(
                jax.value_and_grad(lambda p, xx: f(xla, p, xx), (0, 1))
            )(params, x)
            got, gg = jax.jit(
                jax.value_and_grad(lambda p, xx: f(fused, p, xx), (0, 1))
            )(params, x)
            rel = _rel_err(float(got), float(want))
            gnw = float(
                jax.jit(
                    lambda t: sum(
                        (l.astype(jnp.float32) ** 2).sum()
                        for l in jax.tree_util.tree_leaves(t)
                    )
                )(gw)
            ) ** 0.5
            gng = float(
                jax.jit(
                    lambda t: sum(
                        (l.astype(jnp.float32) ** 2).sum()
                        for l in jax.tree_util.tree_leaves(t)
                    )
                )(gg)
            ) ** 0.5
            grel = abs(gng - gnw) / max(1.0, gnw)
            out[tag] = {
                "ok": bool(rel < 0.05 and grel < 0.05),
                "rel": round(rel, 5),
                "grad_norm_rel": round(grel, 5),
            }
        except Exception:
            out[tag] = {"ok": False, "error": traceback.format_exc()[-800:]}
        print(f"[preflight] conv_module {tag}: {out[tag]}", flush=True)
    return out


def run_preflight() -> dict:
    """Compile + parity for every Pallas kernel family on the live backend.
    Returns a JSON-serializable dict with a top-level all_ok."""
    import jax

    res = {
        "backend": jax.default_backend(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "attention": preflight_attention(),
        "ctc": preflight_ctc(),
        "frontend": preflight_frontend(),
        "conv_module": preflight_conv_module(),
    }

    def _all_ok(node) -> bool:
        if isinstance(node, dict):
            if "ok" in node and not isinstance(node["ok"], dict):
                return bool(node["ok"])
            return all(
                _all_ok(v) for v in node.values() if isinstance(v, dict)
            )
        return True

    res["all_ok"] = all(
        _all_ok(res[k])
        for k in ("attention", "ctc", "frontend", "conv_module")
    )
    return res
