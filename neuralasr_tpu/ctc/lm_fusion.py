"""Character n-gram LM shallow fusion for beam search (config 4).

The reference has no LM fusion (SURVEY.md §1 note — it is spec-mandated
growth).  TPU-native design: an order-k character n-gram LM is a *dense*
log-prob table [V^(k-1), V] living in HBM; scoring a beam is one context-id
computation (polynomial index over the last k-1 label ids) plus one row
gather — fully jittable inside the beam-search scan, no trie walking.

V=29 keeps tables tiny (trigram: 841 x 29 floats).  Training: counts +
Lidstone smoothing from any iterable of transcripts, on host.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..text import VOCAB_SIZE, encode


class NGramLM:
    """Dense char n-gram LM with a jittable shallow-fusion scorer."""

    def __init__(self, table: np.ndarray, order: int, vocab_size: int = VOCAB_SIZE):
        assert table.shape == (vocab_size ** (order - 1), vocab_size)
        self.order = order
        self.vocab_size = vocab_size
        self.table = jnp.asarray(table, dtype=jnp.float32)

    @classmethod
    def train(
        cls,
        transcripts,
        order: int = 3,
        vocab_size: int = VOCAB_SIZE,
        alpha: float = 0.1,
    ) -> "NGramLM":
        """Lidstone-smoothed counts over encoded transcripts.

        Context id 0 (all-blank history) doubles as the start-of-sequence
        context, matching the scorer's zero-initialized prefix buffers.
        """
        k = order - 1
        counts = np.full((vocab_size**k, vocab_size), alpha, dtype=np.float64)
        mults = vocab_size ** np.arange(k - 1, -1, -1)
        for tr in transcripts:
            ids = encode(tr) if isinstance(tr, str) else list(tr)
            ctx = [0] * k
            for c in ids:
                counts[int(np.dot(ctx, mults)), c] += 1.0
                ctx = ctx[1:] + [c]
        table = np.log(counts / counts.sum(axis=1, keepdims=True))
        return cls(table.astype(np.float32), order, vocab_size)

    def score_fn(self):
        """Returns lm_fn(prefixes [W, Lmax], lens [W]) -> [W, V] for
        beam_search_decode's `lm_fn` hook (hashable: bind via closure)."""
        table = self.table
        k = self.order - 1
        V = self.vocab_size
        mults = jnp.asarray(V ** np.arange(k - 1, -1, -1), dtype=jnp.int32)

        def lm_fn(prefixes: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
            W, Lmax = prefixes.shape
            # Last k ids of each prefix (blank=0 pads short histories, which
            # matches the start-of-sequence context used in training).
            offs = jnp.arange(-k, 0)[None, :] + lens[:, None]  # [W, k]
            gathered = jnp.take_along_axis(
                prefixes, jnp.clip(offs, 0, Lmax - 1), axis=1
            )
            gathered = jnp.where(offs >= 0, gathered, 0)
            ctx = (gathered * mults[None, :]).sum(axis=1)  # [W]
            return table[ctx]

        return lm_fn
