"""Single-utterance / file-list transcription CLI (the reference's `test.py`
usage surface, SURVEY.md §2 L6: decode-one-utterance workflow).

    python transcribe.py --config tiny --workdir runs/tiny audio.wav [more.wav]
    python transcribe.py --config base --workdir runs/base --beam 16 *.wav

Reads 16-bit PCM WAV or FLAC via the native C++ decoders (host I/O,
SURVEY.md §3 "audio codec decode stays host-side"; pure-Python FLAC
fallback in data/flac.py), runs the on-device frontend + encoder
+ CTC decode (greedy, or beam search when --beam > 1), and prints one JSON
line per file: {"file": ..., "text": ..., "audio_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+", help="16-bit PCM WAV files")
    p.add_argument("--config", default="tiny")
    p.add_argument("--workdir", default=None)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--blank-collapse", type=float, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralasr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import os

    from neuralasr_tpu.configs import PRESETS
    from neuralasr_tpu.training import Trainer
    from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like
    from neuralasr_tpu.ctc.greedy import greedy_decode
    from neuralasr_tpu.ctc.beam import beam_search_decode, blank_collapse
    from neuralasr_tpu.data.buckets import bucket_for
    from neuralasr_tpu.text import decode as ids_to_text

    try:
        from neuralasr_tpu.native import wav_decode
    except ImportError:  # toolchain-less host: scipy fallback
        from scipy.io import wavfile

        def wav_decode(data: bytes):
            import io

            rate, samples = wavfile.read(io.BytesIO(data))
            if samples.ndim > 1:  # multichannel: take channel 0
                samples = samples[:, 0]
            if samples.dtype == np.int16:
                samples = samples.astype(np.float32)
            else:
                # IEEE-float WAVs store [-1, 1]; rescale to PCM16 range
                # (matching data/librispeech.py's fallback) or the int16
                # quantization below collapses them to silence.
                samples = samples.astype(np.float32) * 32768.0
            return samples, rate

    cfg = PRESETS[args.config]
    workdir = args.workdir or f"runs/{cfg.name}"
    trainer = Trainer(cfg)
    ckpt = Checkpointer(os.path.join(workdir, "ckpt"))
    state, meta = ckpt.restore(abstract_like(trainer.state))
    if state is None:
        print(f"[transcribe] no checkpoint under {workdir}/ckpt", file=sys.stderr)
        sys.exit(2)
    trainer.state = state

    sr = cfg.features.sample_rate
    fwd_fns: dict[int, callable] = {}

    def transcribe_one(path: str) -> dict:
        with open(path, "rb") as f:
            raw = f.read()
        if path.lower().endswith(".flac") or raw[:4] == b"fLaC":
            try:  # native C++ FLAC decoder; pure-Python fallback
                from neuralasr_tpu.native import flac_decode
            except ImportError:
                from neuralasr_tpu.data.flac import flac_decode
            samples, rate = flac_decode(raw)
        else:
            samples, rate = wav_decode(raw)
        if rate != sr:
            print(
                f"[transcribe] {path}: sample rate {rate} != model rate {sr} "
                "(no resampler; prepare audio at the model rate)",
                file=sys.stderr,
            )
            sys.exit(2)
        n = len(samples)
        b_idx = bucket_for(trainer.buckets, n, 0)
        if b_idx is None:
            b_idx = len(trainer.buckets) - 1
            n = trainer.buckets[b_idx].max_samples
            samples = samples[:n]
        spec = trainer.buckets[b_idx]
        wav = np.zeros((1, spec.max_samples), dtype=np.int16)
        wav[0, :n] = np.clip(np.rint(samples[:n]), -32768, 32767)
        if b_idx not in fwd_fns:
            frontend = trainer._frontend_for(b_idx)

            @jax.jit
            def fwd(params, wav, wav_lens, _fe=frontend):
                feats, feat_lens = _fe(wav, wav_lens)
                return trainer.model.apply(
                    {"params": params}, feats, feat_lens, train=False
                )

            fwd_fns[b_idx] = fwd
        logits, out_lens = fwd_fns[b_idx](
            trainer.state["params"], jnp.asarray(wav), jnp.asarray([n], jnp.int32)
        )
        if args.beam > 1:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lens = out_lens
            if args.blank_collapse is not None:
                lp, lens = blank_collapse(
                    lp, out_lens, threshold=args.blank_collapse
                )
            pref, lens_b, _ = beam_search_decode(
                lp,
                lens,
                beam_width=args.beam,
                max_label_len=int(spec.max_label_len) + 8,
            )
            ids = np.asarray(pref)[0, 0, : int(np.asarray(lens_b)[0, 0])]
        else:
            g_ids, g_lens = greedy_decode(logits, out_lens)
            ids = np.asarray(g_ids)[0, : int(np.asarray(g_lens)[0])]
        return {
            "file": path,
            "text": ids_to_text(ids),
            "audio_s": round(len(samples) / sr, 3),
        }

    for path in args.files:
        print(json.dumps(transcribe_one(path)))


if __name__ == "__main__":
    main()
