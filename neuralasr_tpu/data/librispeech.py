"""LibriSpeech-layout corpus reader (host-side I/O).

Walks the standard layout the reference trains on (SURVEY.md §4.1):

    root/<split>/<speaker>/<chapter>/<spk>-<chp>-<utt>.{wav,flac}
    root/<split>/<speaker>/<chapter>/<spk>-<chp>.trans.txt

Audio decode: .wav via the native C++ PCM16 parser (scipy fallback);
.flac — LibriSpeech's actual codec — via the native C++ FLAC decoder
(native/asr_native.cpp), with the pure-Python decoder in data/flac.py as
the toolchain-less fallback.  Presents the same corpus protocol as
SyntheticCorpus (len / transcript(i) / waveform(i) / [i] / num_samples(i)),
so BucketedLoader is corpus-agnostic.  Lengths are cached on first pass.
"""

from __future__ import annotations

import os

import numpy as np


class LibriSpeechCorpus:
    def __init__(self, root: str, split: str = "dev-clean"):
        self.root = os.path.join(root, split)
        if not os.path.isdir(self.root):
            raise FileNotFoundError(f"no such corpus split: {self.root}")
        self._utts: list[tuple[str, str]] = []  # (audio_path, transcript)
        for dirpath, _, files in sorted(os.walk(self.root)):
            trans = {}
            for f in sorted(files):
                if f.endswith(".trans.txt"):
                    with open(os.path.join(dirpath, f)) as fh:
                        for line in fh:
                            key, _, text = line.strip().partition(" ")
                            trans[key] = text
            for f in sorted(files):
                stem, ext = os.path.splitext(f)
                if ext in (".wav", ".flac") and stem in trans:
                    self._utts.append(
                        (os.path.join(dirpath, f), trans[stem])
                    )
        self._len_cache: dict[int, int] = {}

    def __len__(self) -> int:
        return len(self._utts)

    def transcript(self, index: int) -> str:
        return self._utts[index][1]

    def waveform(self, index: int) -> np.ndarray:
        path = self._utts[index][0]
        if path.endswith(".wav"):
            try:  # native C++ PCM16 parser (threaded-metrics sibling)
                from ..native import wav_decode

                with open(path, "rb") as fh:
                    samples, _rate = wav_decode(fh.read())
                return samples
            except (ImportError, ValueError):
                pass
            from scipy.io import wavfile

            _, data = wavfile.read(path)
            if data.dtype == np.int16:
                return data.astype(np.float32)
            return data.astype(np.float32) * 32768.0
        with open(path, "rb") as fh:
            raw = fh.read()
        try:  # native C++ FLAC decoder (CRC-verified)
            from ..native import flac_decode

            samples, _rate = flac_decode(raw)
            return samples
        except ImportError:
            from .flac import flac_decode as py_flac_decode

            samples, _rate = py_flac_decode(raw)
            return samples

    def __getitem__(self, index: int):
        return self.waveform(index), self.transcript(index)

    def num_samples(self, index: int) -> int:
        """Sample count without decoding audio where possible: the loader
        calls this for EVERY utterance at init (bucketing pass), so .wav
        lengths come from the RIFF header and .flac lengths from the
        STREAMINFO total-samples field — no frame decode either way."""
        if index not in self._len_cache:
            path = self._utts[index][0]
            if path.endswith(".wav"):
                import wave

                try:
                    with wave.open(path, "rb") as w:
                        self._len_cache[index] = w.getnframes()
                    return self._len_cache[index]
                except wave.Error:
                    pass  # unusual encoding: fall through to full decode
            elif path.endswith(".flac"):
                from .flac import parse_streaminfo

                with open(path, "rb") as fh:
                    head = fh.read(4096)
                try:
                    total = parse_streaminfo(head)["total_samples"]
                    if total:  # 0 = unknown: fall through to full decode
                        self._len_cache[index] = total
                        return total
                except ValueError:
                    pass
            self._len_cache[index] = len(self.waveform(index))
        return self._len_cache[index]
