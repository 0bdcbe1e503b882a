"""Per-module device-time attribution for the conformer train step.

BASELINE r3's "mfu target accounting" attributes the remaining gap to
mfu 0.40 to the encoder's LN/GLU/depthwise-conv glue (~25-30 % of cycles,
ESTIMATED).  Standalone submodule timing cannot measure it here: the axon
tunnel adds ~2 ms per dispatch (and `block_until_ready` alone does not
fully fence execution — see runs/encoder_breakdown.jsonl's discarded
first attempt), so anything under a few ms drowns.  This tool measures
attribution the only honest way on this link: a jax.profiler trace of the
REAL compiled train step, parsed from the xplane protobuf, with device op
time grouped by the flax name scope carried in each HLO op's metadata.

Fusions spanning scopes are attributed to their root op's scope; the
split is approximate at the boundary but the ranking is real.

Usage: python tools/encoder_trace.py [--batch 64] [--steps 5]
Writes runs/encoder_trace_attrib.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(args, trace_dir):
    from neuralasr_tpu.configs import CONFIG5
    from neuralasr_tpu.data.loader import Batch
    from neuralasr_tpu.training import Trainer

    on_tpu = jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        CONFIG5,
        num_utterances=64,
        batch_size=args.batch * 4,
        specaugment=True,
        cache_dir="",
        features=dataclasses.replace(
            CONFIG5.features,
            use_pallas=on_tpu,
            compute_dtype="bfloat16",
        ),
        ctc_impl="pallas_stream" if on_tpu else CONFIG5.ctc_impl,
        model=dataclasses.replace(
            CONFIG5.model,
            use_pallas_attention=on_tpu,
            dtype=jnp.bfloat16,
            **(
                {"pallas_attn_min_t": args.attn_min_t}
                if args.attn_min_t is not None
                else {}
            ),
            **(
                {"attn_impl": args.attn_impl}
                if args.attn_impl is not None
                else {}
            ),
            **(
                {"conv_impl": args.conv_impl}
                if args.conv_impl is not None
                else {}
            ),
        ),
    )
    trainer = Trainer(cfg)
    sr = cfg.features.sample_rate
    bucket = next(
        i for i, b in enumerate(trainer.buckets) if b.max_samples >= 8 * sr
    )
    spec = trainer.buckets[bucket]
    rng = np.random.default_rng(0)
    B = spec.batch_size
    wav = (rng.normal(size=(B, spec.max_samples)) * 1000).astype(np.int16)
    wav_lens = np.full((B,), spec.max_samples, np.int32)
    labels = rng.integers(1, 29, size=(B, spec.max_label_len)).astype(np.int32)
    label_lens = np.full((B,), spec.max_label_len, np.int32)
    weights = np.ones((B,), np.float32)
    batch = Batch(wav, wav_lens, labels, label_lens, weights, bucket, 0, 0)

    trainer.train_batch(batch)
    jax.block_until_ready(trainer.state["params"])
    dev_args = trainer.put_batch(batch)
    trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])

    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        trainer.train_batch_device(bucket, dev_args)
    jax.block_until_ready(trainer.state["params"])
    jax.profiler.stop_trace()

    # Dump the step program's optimized HLO: the trace's events carry only
    # HLO instruction names; the op_name metadata here maps them back to
    # flax scopes (block_3/mhsa/qkv/...) for attribution.
    step_fn = trainer._step_for(bucket)
    rng = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed + 17), trainer.step
    )
    txt = step_fn.lower(trainer.state, rng, *dev_args).compile().as_text()
    with open(os.path.join(trace_dir, "step_hlo.txt"), "w") as f:
        f.write(txt)


# Buckets: regexes over the HLO op_name metadata (flax scopes).
GROUPS = [
    ("mhsa_attention_kernel", re.compile(r"flash_attention|mhsa.*(custom-call|pallas)|pallas_attention")),
    ("mhsa_proj", re.compile(r"mhsa/(qkv|proj)")),
    ("mhsa_other", re.compile(r"mhsa/")),
    ("feedforward", re.compile(r"/(ff1|ff2)/")),
    ("conv_module_dw", re.compile(r"conv/dw")),
    ("conv_module_pw", re.compile(r"conv/(pw_in|pw_out)")),
    ("conv_module_other", re.compile(r"(block_\d+|blocks?)/conv/")),
    ("layernorm", re.compile(r"(LayerNorm|final_norm|/norm/)")),
    ("frontend", re.compile(r"frontend|log_mel|frame|mel|dft|stft", re.I)),
    ("subsample", re.compile(r"subsample|in_proj")),
    # The CTC scan compiles to while loops whose bodies carry the
    # emission/occupancy einsum scopes (bv,bsv->bs / bs,bsv->bv).
    # The streaming CTC kernels appear as bare train-step-level
    # pallas_call scopes (jvp()/pallas_call fwd, transpose(jvp())/... bwd);
    # the attention kernel carries mhsa/ and the frontend kernel the
    # jit(frontend) scope, so the bare form is CTC's.
    ("ctc", re.compile(r"ctc|alpha|beta|log_softmax|output/|"
                       r"bv,bsv|bs,bsv|/while|"
                       r"jvp\(\)?\)?/pallas_call", re.I)),
    ("optimizer", re.compile(r"adam|opt_state|optax|scale_by|apply_updates|"
                             r"global_norm|clip", re.I)),
    ("specaugment", re.compile(r"specaug|threefry|random_bits", re.I)),
]

# Fallback: classify scope-less instructions by their HLO kind (round 4,
# VERDICT r3 item 3 — 18 % of the step was an unattributed "other" bucket
# whose example span was "copy-start").
KIND_GROUPS = [
    # Layout-change copies and their async halves (a transpose that XLA
    # lowers to a copy shows up here, not under its producing scope).
    ("copies_layout", re.compile(r"^%?(copy|copy-start|copy-done|bitcast)")),
    ("host_transfers", re.compile(r"(infeed|outfeed|recv|send|transfer)", re.I)),
    ("collectives", re.compile(r"(all-reduce|all-gather|reduce-scatter|"
                               r"collective|ppermute)", re.I)),
    ("buffer_updates", re.compile(r"dynamic-update-slice")),
    ("convert_reshape", re.compile(r"^%?(convert|reshape|broadcast|slice)")),
]


def classify(op_name: str, instr_text: str = "") -> str:
    for name, rx in GROUPS:
        if rx.search(op_name):
            return name
    for name, rx in KIND_GROUPS:
        if rx.search(instr_text):
            return name
    return "other"


_HLO_LINE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=.*?"
                       r"metadata=\{[^}]*op_name=\"([^\"]+)\"")


def load_scope_map(trace_dir):
    """instruction name -> op_name scope, from the dumped optimized HLO."""
    path = os.path.join(trace_dir, "step_hlo.txt")
    scope = {}
    if not os.path.exists(path):
        return scope
    with open(path) as f:
        for ln in f:
            m = _HLO_LINE.match(ln)
            if m:
                scope[m.group(1)] = m.group(2)
    return scope


def parse(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    # Each capture creates plugins/profile/<timestamp>/; parse ONLY the
    # newest session — summing across stale sessions double-counts (the
    # first r4a trace summed the r3 + r4 sessions to a bogus 90 ms step).
    sessions = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*")))
    if not sessions:
        raise SystemExit(f"no profile sessions under {trace_dir}")
    pbs = glob.glob(os.path.join(sessions[-1], "*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no xplane.pb under {sessions[-1]}")
    scope_map = load_scope_map(trace_dir)
    totals = {}
    examples = {}
    per_instr = {}
    device_total_ps = 0
    for pb in pbs:
        space = xplane_pb2.XSpace()
        with open(pb, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_md = plane.event_metadata
            for line in plane.lines:
                # Per-HLO events live on the "XLA Ops" line; module/step
                # lines would double-count.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = ev_md[ev.metadata_id]
                    # md.name is the HLO text: "%fusion.3 = f32[...] ..."
                    instr = (md.display_name or md.name).strip()
                    m = re.match(r"%?([\w.\-]+)", md.name.strip().lstrip("%"))
                    iname = m.group(1) if m else instr
                    dur = 0
                    for st in ev.stats:
                        if stat_md.get(st.metadata_id, "") == "device_duration_ps":
                            dur = st.uint64_value or st.int64_value
                    if not dur:
                        dur = ev.duration_ps
                    op_scope = scope_map.get(iname, "")
                    key = classify(op_scope + " " + md.name[:200], instr)
                    totals[key] = totals.get(key, 0) + dur
                    device_total_ps += dur
                    pk = (key, iname)
                    if pk not in per_instr:
                        per_instr[pk] = [0, (op_scope or instr)[:200]]
                    per_instr[pk][0] += dur
                    if key not in examples:
                        examples[key] = (op_scope or instr)[:160]
    return totals, examples, device_total_ps, per_instr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--attn-min-t", type=int, default=None,
                    help="override ModelConfig.pallas_attn_min_t for the "
                         "traced step (0 = kernel everywhere)")
    ap.add_argument("--attn-impl", default=None,
                    choices=["split", "packed"],
                    help="short-T XLA attention layout (round 5)")
    ap.add_argument("--conv-impl", default=None, choices=["xla", "pallas"],
                    help="conv module implementation (round 5)")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None, metavar="DIR")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trace_dir = args.parse_only or args.trace_dir or os.path.join(
        root, "runs", "encoder_trace"
    )
    if not args.parse_only:
        capture(args, trace_dir)

    totals, examples, total_ps, per_instr = parse(trace_dir)
    if not os.path.exists(os.path.join(trace_dir, "step_hlo.txt")):
        print("[warn] no step_hlo.txt next to trace — scope attribution "
              "will be category-only", file=sys.stderr)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    out = {
        "steps": args.steps,
        "batch": args.batch,
        "total_device_ms": round(total_ps / 1e9, 3),
        "per_step_ms": round(total_ps / 1e9 / args.steps, 3),
        "groups": {
            k: {
                "ms_per_step": round(v / 1e9 / args.steps, 3),
                "pct": round(100.0 * v / max(total_ps, 1), 1),
                "example": examples.get(k, ""),
            }
            for k, v in rows
        },
    }
    # Top individual instructions of the residual buckets, so every >=1 ms
    # owner can be named (VERDICT r3 item 3: <5 % unattributed target).
    resid = [
        (k, i, v, scope) for (k, i), (v, scope) in per_instr.items()
        if k in ("other", "copies_layout", "convert_reshape",
                 "buffer_updates")
    ]
    resid.sort(key=lambda r: -r[2])
    out["top_residual_instructions"] = [
        {
            "group": k,
            "instr": i,
            "ms_per_step": round(v / 1e9 / args.steps, 3),
            "scope_or_text": scope,
        }
        for k, i, v, scope in resid[:25]
    ]
    unattrib = sum(totals.get(k, 0) for k in ("other",))
    out["unattributed_pct"] = round(100.0 * unattrib / max(total_ps, 1), 1)
    print(json.dumps(out, indent=2))
    with open(os.path.join(root, "runs", "encoder_trace_attrib.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
