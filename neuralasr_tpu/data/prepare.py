"""Offline corpus preparation (SURVEY.md §2 L1, §4.1).

The reference walks LibriSpeech and writes per-utterance feature files; the
TPU-native equivalent writes PACKED shards (one .npz per ~512 utterances:
concatenated waveforms + offsets + encoded transcripts) plus a JSON
manifest.  Packing matters on pod fronts: thousands of tiny files serialize
badly on network filesystems; shards stream.

Waveforms are stored raw (features are computed on-device, fused with the
encoder — storing MFCCs on disk, as the reference does, would pin the
feature configuration at prep time and double storage).

CLI:  python -m neuralasr_tpu.data.prepare --corpus synthetic --out data/dev
      python -m neuralasr_tpu.data.prepare --corpus /path/LibriSpeech \
          --split dev-clean --out data/dev_clean
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..text import encode
from .synthetic import SyntheticCorpus


def write_shards(
    corpus, out_dir: str, shard_size: int = 512, dtype=np.float32
) -> dict:
    """dtype=np.int16 stores PCM16 (half the bytes; lossless whenever the
    consumer quantizes to int16 anyway, as the training loader does)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = {"num_utterances": len(corpus), "shards": []}
    for s0 in range(0, len(corpus), shard_size):
        ids = range(s0, min(s0 + shard_size, len(corpus)))
        wavs, texts = [], []
        for i in ids:
            w, t = corpus[i]
            w = np.asarray(w)
            if dtype == np.int16:
                w = np.clip(np.rint(w), -32768, 32767).astype(np.int16)
            else:
                w = w.astype(dtype)
            wavs.append(w)
            texts.append(t)
        offsets = np.zeros(len(wavs) + 1, dtype=np.int64)
        np.cumsum([len(w) for w in wavs], out=offsets[1:])
        # Samples live in their own .npy: np.load silently IGNORES
        # mmap_mode for .npz members, so a combined archive would read the
        # whole shard into RAM on first touch; a bare .npy memory-maps.
        shard_name = f"shard_{s0 // shard_size:05d}"
        np.save(
            os.path.join(out_dir, shard_name + ".samples.npy"),
            np.concatenate(wavs) if wavs else np.zeros(0, dtype),
        )
        np.savez(
            os.path.join(out_dir, shard_name + ".meta.npz"),
            offsets=offsets,
            transcripts=np.asarray(texts, dtype=object),
            # Length metadata baked in at prep time: BucketedLoader init
            # reads ONLY these arrays (never transcripts/audio) to bucket a
            # corpus, so init cost is two small array loads per shard
            # instead of a Python loop over every utterance (VERDICT r2
            # item 6).
            label_lens=np.asarray(
                [len(encode(t)) for t in texts], dtype=np.int32
            ),
        )
        manifest["shards"].append(
            {
                "file": shard_name,
                "first": s0,
                "count": len(wavs),
                "audio_samples": int(offsets[-1]),
            }
        )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


class PackedCorpus:
    """Corpus-protocol reader over prepared shards (mmap-backed)."""

    def __init__(self, directory: str):
        self.directory = directory
        with open(os.path.join(directory, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        self._shards: dict[int, dict] = {}
        self._index: list[tuple[int, int]] = []  # utt -> (shard, local)
        for si, sh in enumerate(self.manifest["shards"]):
            for li in range(sh["count"]):
                self._index.append((si, li))

    def _shard(self, si: int) -> dict:
        if si not in self._shards:
            stem = os.path.join(
                self.directory, self.manifest["shards"][si]["file"]
            )
            if not os.path.exists(stem + ".meta.npz"):
                raise FileNotFoundError(
                    f"{stem}.meta.npz missing — this looks like a corpus "
                    "packed by an older release (single-.npz shards); "
                    "re-pack it with `neuralasr-prepare` (the current "
                    "format stores samples as mmap-able bare .npy)"
                )
            meta = np.load(stem + ".meta.npz", allow_pickle=True)
            samples = np.load(stem + ".samples.npy", mmap_mode="r")
            try:
                # Shuffled batches read utterances in random order; default
                # kernel readahead then faults in ~10x the bytes actually
                # used (measured on the 100k corpus).  MADV_RANDOM disables
                # it; pages remain demand-loaded and evictable.
                import mmap as _mmap

                samples.base.madvise(_mmap.MADV_RANDOM)
            except (AttributeError, OSError):  # non-mmap base / platform
                pass
            self._shards[si] = {
                # True mmap: the OS pages audio in on demand and evicts it
                # under pressure — a 960 h corpus never has to fit in RAM.
                "samples": samples,
                "offsets": meta["offsets"],
                "transcripts": meta["transcripts"],
            }
            if "label_lens" in meta.files:
                self._shards[si]["label_lens"] = meta["label_lens"]
        return self._shards[si]

    def __len__(self) -> int:
        return len(self._index)

    def transcript(self, index: int) -> str:
        si, li = self._index[index]
        return str(self._shard(si)["transcripts"][li])

    def waveform(self, index: int) -> np.ndarray:
        si, li = self._index[index]
        sh = self._shard(si)
        lo, hi = sh["offsets"][li], sh["offsets"][li + 1]
        return np.asarray(sh["samples"][lo:hi], dtype=np.float32)

    def __getitem__(self, index: int):
        return self.waveform(index), self.transcript(index)

    def num_samples(self, index: int) -> int:
        si, li = self._index[index]
        off = self._shard(si)["offsets"]
        return int(off[li + 1] - off[li])

    def lengths(self) -> tuple[np.ndarray, np.ndarray]:
        """(num_samples [N], label_lens [N]) without touching audio or (for
        current-format shards) transcripts — the loader's vectorized
        bucketing input.  Shards packed before label_lens existed fall back
        to encoding transcripts here, once."""
        ns, ls = [], []
        for si in range(len(self.manifest["shards"])):
            sh = self._shard(si)
            ns.append(np.diff(sh["offsets"]).astype(np.int64))
            if "label_lens" in sh:
                ls.append(sh["label_lens"])
            else:  # legacy shard: derive and keep
                ls.append(
                    np.asarray(
                        [len(encode(str(t))) for t in sh["transcripts"]],
                        dtype=np.int32,
                    )
                )
        return np.concatenate(ns), np.concatenate(ls)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="synthetic")
    p.add_argument("--split", default="dev-clean")
    p.add_argument("--num-utterances", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--shard-size", type=int, default=512)
    p.add_argument("--dtype", default="float32", choices=["float32", "int16"],
                   help="int16 halves shard bytes; lossless whenever the "
                        "consumer quantizes to PCM16 (the training loader "
                        "does)")
    args = p.parse_args()

    if args.corpus == "synthetic":
        corpus = SyntheticCorpus(args.num_utterances, seed=args.seed)
    else:
        from .librispeech import LibriSpeechCorpus

        corpus = LibriSpeechCorpus(args.corpus, args.split)
    m = write_shards(
        corpus,
        args.out,
        args.shard_size,
        dtype=np.int16 if args.dtype == "int16" else np.float32,
    )
    total_s = sum(s["audio_samples"] for s in m["shards"]) / 16000
    print(
        f"[prepare] wrote {m['num_utterances']} utterances "
        f"({total_s:.1f} audio-s) in {len(m['shards'])} shards to {args.out}"
    )


if __name__ == "__main__":
    main()
