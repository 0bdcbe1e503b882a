"""Pallas TPU kernels: the speed-of-light paths (BASELINE.json north_star).

- pallas_attention: fused blockwise self-attention for the Conformer
  (SURVEY.md §6 long-context: blockwise over time within one chip).
- pallas_frontend: fused framing+window+DFT+mel feature extraction.

Every kernel has a jnp reference implementation used for its custom_vjp
backward and for allclose parity tests; kernels run in interpret mode off
TPU so the whole suite stays CPU-testable.
"""
