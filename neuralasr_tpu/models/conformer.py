"""Conformer encoder (config 5; spec-mandated growth beyond the reference —
SURVEY.md §1).

TPU-first choices:
- RoPE positional encoding (no learned rel-pos tables; pure elementwise on
  the VPU, fuses into the attention matmuls).
- LayerNorm in the conv module instead of BatchNorm (no cross-batch stats to
  sync across the mesh; standard for TPU conformers).
- Attention runs either as plain XLA dot-product attention (CPU/tests) or as
  the Pallas fused blockwise kernel (ops/pallas_attention.py) — the
  "blockwise over time within one chip" long-context answer of SURVEY.md §6.
- Weight matrices carry flax logical axes ('embed' -> 'ff'/'heads') so the
  encoder shards over the 'model' mesh axis when it exceeds one chip's HBM
  (BASELINE.json).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _dense(feat, name, axes=("embed", "ff"), dtype=jnp.float32, zero_init=False):
    # zero_init: residual-branch output projections start at zero so every
    # block is the identity at init. Without this the 12-block stack starts
    # with grad-norm ~1.7e3 and settles into the all-blank CTC local optimum
    # (observed: single-batch overfit plateaus at loss ~50 for 12 blocks
    # while 2 blocks reach 0 in 50 steps); with it the deep stack trains.
    init = nn.initializers.zeros if zero_init else nn.initializers.glorot_uniform()
    return nn.Dense(
        feat,
        dtype=dtype,
        name=name,
        kernel_init=nn.with_logical_partitioning(init, axes),
    )


def rope(x: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding over the last dim of [B, T, H, D].
    Standalone variant (tables derived in place) — kept for tests; the
    encoder hoists the tables once per program and passes them down
    (VERDICT r3 item 2: round 3 re-derived cos/sin inside all 12 blocks'
    forward AND backward traces)."""
    from ..ops.pallas_attention import apply_rope, rope_tables

    T, D = x.shape[1], x.shape[3]
    cos, sin = rope_tables(T, D, base)
    return apply_rope(x, cos, sin)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = _dense(self.dim * self.mult, "in", ("embed", "ff"), self.dtype)(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _dense(self.dim, "out", ("ff", "embed"), self.dtype, zero_init=True)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class MHSA(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    # partition=False uses the bare Pallas call (single-device; no
    # custom-call partitioning boundary); True is required under meshes.
    partition: bool = True
    dtype: Dtype = jnp.float32
    # Engage the Pallas kernel only for programs whose (static) T is at
    # least this many frames; below it, plain XLA attention.  T is a
    # trace-time constant per bucket program, so this is compile-time
    # dispatch: short buckets get XLA attention, long buckets the blockwise
    # kernel.  Measured on 1x v5e (runs/encoder_trace_attrib.json + the
    # crossover ladder in BASELINE.md r3): at T=240/B=64 the kernel's grid
    # (B*H programs x ~12 us dispatch overhead) costs ~0.9 ms/layer more
    # than XLA attention (24 % of the whole train step across 12 blocks);
    # from T~480 the two tie, and at long T the kernel wins on memory (no
    # [B,H,T,T] materialization).  0 = always use the kernel.
    attn_min_t: int = 0
    # XLA-path layout (the short-T side of the dispatch):
    # - "split": round-4 form — split qkv, reshape to [B,T,H,D], rope via
    #   the concat formulation, einsums that transpose each of q/k/v
    #   separately (the 3.1 ms/step of copy-done events in the r4 trace).
    # - "packed": one [B,T,3,H,D] -> [3,B,H,T,D] transpose moves all three
    #   tensors in a single copy; rope is the x@R rotation-matmul (an MXU
    #   op instead of a concat copy); the mask is an additive bias (fuses
    #   into the softmax instead of a materialized select); the einsums
    #   are head-major-native so XLA inserts no further layout copies.
    #   Identical math (rotation == concat formulation; additive -1e30 ==
    #   select under softmax, grads included).
    attn_impl: str = "split"

    @nn.compact
    def __call__(self, x, mask_b_t, train: bool, rope_cs=None):
        from ..ops.pallas_attention import apply_rope, rope_tables

        B, T, _ = x.shape
        H = self.num_heads
        Dh = self.dim // H
        h = nn.LayerNorm(dtype=self.dtype)(x)
        qkv = _dense(3 * self.dim, "qkv", ("embed", "heads"), self.dtype)(h)
        # Rope tables are hoisted to the encoder (computed once per bucket
        # program, shared by all blocks); standalone use derives them here.
        cos, sin = rope_cs if rope_cs is not None else rope_tables(T, Dh)

        if self.use_pallas and T >= self.attn_min_t:
            from ..ops.pallas_attention import (
                flash_attention_local_rope,
                flash_attention_rope,
            )

            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, H, Dh)
            k = k.reshape(B, T, H, Dh)
            v = v.reshape(B, T, H, Dh)
            # Rope is applied INSIDE the kernel (fwd: rope(q/k); bwd:
            # inverse rotation on dq/dk) — roped q/k never reach HBM.
            attn_fn = (
                flash_attention_rope
                if self.partition
                else flash_attention_local_rope
            )
            out = attn_fn(q, k, v, mask_b_t, cos, sin)
        elif self.attn_impl == "packed":
            from ..ops.pallas_attention import _rot_mat

            # One layout transition for q, k, v together.
            qkv5 = qkv.reshape(B, T, 3, H, Dh).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv5[0], qkv5[1], qkv5[2]  # [B, H, T, Dh]
            R = _rot_mat(Dh)  # rot_half as a constant [Dh, Dh] rotation
            cb = cos[None, None]
            sb = sin[None, None]

            def rope_bhtd(t):
                # t @ R is a signed permutation — exact in any dtype, so
                # the rotation matmul runs in the compute dtype while the
                # cos/sin combine stays f32 (matches apply_rope exactly).
                rot = t @ R.astype(t.dtype)
                tf = t.astype(jnp.float32)
                return (tf * cb + rot.astype(jnp.float32) * sb).astype(
                    t.dtype
                )

            q = rope_bhtd(q)
            k = rope_bhtd(k)
            scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            neg = jnp.asarray(-1e30, dtype=logits.dtype)
            bias = jnp.where(mask_b_t, 0.0, neg)[:, None, None, :]
            attn = jax.nn.softmax(logits + bias, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bqhd", attn, v)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, T, H, Dh)
            k = k.reshape(B, T, H, Dh)
            v = v.reshape(B, T, H, Dh)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            neg = jnp.asarray(-1e30, dtype=logits.dtype)
            logits = jnp.where(mask_b_t[:, None, None, :], logits, neg)
            attn = jax.nn.softmax(logits, axis=-1)
            # NO attention-prob dropout here: the Pallas kernel applies
            # none, and the attn_min_t dispatch must not change model
            # behavior between short and long buckets (ADVICE r3).
            # Residual-branch dropout after proj regularizes instead.
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)

        out = out.reshape(B, T, self.dim)
        out = _dense(self.dim, "proj", ("heads", "embed"), self.dtype, zero_init=True)(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _ParamBank(nn.Module):
    """Creates parameters with the exact names/shapes/inits a flax
    submodule would, WITHOUT instantiating its compute — so a fused-kernel
    path keeps the identical parameter tree (same checkpoint layout, same
    per-path init RNG folding, same logical-axis sharding metadata) as the
    XLA path it replaces."""

    specs: tuple  # of (param_name, shape, init_fn)

    @nn.compact
    def __call__(self):
        return tuple(self.param(n, f, s) for n, s, f in self.specs)


class ConvModule(nn.Module):
    dim: int
    kernel: int = 15
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    # "xla": the flax chain below (mesh-sharded via logical axes).
    # "pallas": the fused single-kernel chain (ops/pallas_conv.py) — every
    # intermediate stays in VMEM; single-device surface (the XLA path
    # remains the implementation under sharded meshes).  Parameter trees
    # are identical between the two (see _ParamBank).
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask_b_t, train: bool):
        if self.impl == "pallas":
            d, K = self.dim, self.kernel
            glorot = nn.initializers.glorot_uniform()
            ones, zeros = nn.initializers.ones, nn.initializers.zeros
            g1, b1 = _ParamBank(
                (("scale", (d,), ones), ("bias", (d,), zeros)),
                name="LayerNorm_0",
            )()
            win, bin_ = _ParamBank(
                (
                    ("kernel", (d, 2 * d),
                     nn.with_logical_partitioning(glorot, ("embed", "ff"))),
                    ("bias", (2 * d,), zeros),
                ),
                name="pw_in",
            )()
            wdw, bdw = _ParamBank(
                (
                    ("kernel", (K, 1, d), nn.initializers.lecun_normal()),
                    ("bias", (d,), zeros),
                ),
                name="dw",
            )()
            g2, b2 = _ParamBank(
                (("scale", (d,), ones), ("bias", (d,), zeros)), name="norm"
            )()
            wout, bout = _ParamBank(
                (
                    ("kernel", (d, d),
                     nn.with_logical_partitioning(zeros, ("ff", "embed"))),
                    ("bias", (d,), zeros),
                ),
                name="pw_out",
            )()
            from ..ops.pallas_conv import fused_conv_module

            h = fused_conv_module(
                x.astype(self.dtype), mask_b_t, g1, b1, win, bin_,
                wdw.reshape(K, d), bdw, g2, b2, wout, bout,
            )
            return nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = _dense(2 * self.dim, "pw_in", ("embed", "ff"), self.dtype)(h)
        h = nn.glu(h, axis=-1)
        # Zero padded frames so the depthwise conv never mixes padding in.
        h = h * mask_b_t[:, :, None].astype(h.dtype)
        h = nn.Conv(
            self.dim,
            kernel_size=(self.kernel,),
            feature_group_count=self.dim,
            padding="SAME",
            dtype=self.dtype,
            name="dw",
        )(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = nn.swish(h)
        h = _dense(self.dim, "pw_out", ("ff", "embed"), self.dtype, zero_init=True)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class ConformerBlock(nn.Module):
    dim: int
    num_heads: int
    ff_mult: int = 4
    conv_kernel: int = 15
    dropout: float = 0.0
    use_pallas_attention: bool = False
    partition_attention: bool = True
    dtype: Dtype = jnp.float32
    attn_min_t: int = 0
    attn_impl: str = "split"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask_b_t, train: bool, rope_cs=None):
        x = x + 0.5 * FeedForward(
            self.dim, self.ff_mult, self.dropout, self.dtype, name="ff1"
        )(x, train)
        x = x + MHSA(
            self.dim,
            self.num_heads,
            self.dropout,
            self.use_pallas_attention,
            self.partition_attention,
            self.dtype,
            attn_min_t=self.attn_min_t,
            attn_impl=self.attn_impl,
            name="mhsa",
        )(x, mask_b_t, train, rope_cs=rope_cs)
        x = x + ConvModule(
            self.dim, self.conv_kernel, self.dropout, self.dtype,
            impl=self.conv_impl, name="conv"
        )(x, mask_b_t, train)
        x = x + 0.5 * FeedForward(
            self.dim, self.ff_mult, self.dropout, self.dtype, name="ff2"
        )(x, train)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)


class ConformerEncoder(nn.Module):
    num_layers: int
    dim: int
    num_heads: int
    ff_mult: int = 4
    conv_kernel: int = 15
    dropout: float = 0.0
    use_pallas_attention: bool = False
    partition_attention: bool = True
    dtype: Dtype = jnp.float32
    attn_min_t: int = 0
    attn_impl: str = "split"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, lens, train: bool = False):
        from ..ops.pallas_attention import rope_tables

        B, T, F = x.shape
        mask_b_t = jnp.arange(T)[None, :] < lens[:, None]  # [B, T]
        # One cos/sin table pair per bucket program, shared by all blocks
        # (fwd and bwd) instead of re-derived in each block's trace.
        rope_cs = rope_tables(T, self.dim // self.num_heads)
        if F != self.dim:
            x = _dense(self.dim, "in_proj", ("hidden", "embed"), self.dtype)(x)
        for i in range(self.num_layers):
            x = ConformerBlock(
                self.dim,
                self.num_heads,
                self.ff_mult,
                self.conv_kernel,
                self.dropout,
                self.use_pallas_attention,
                self.partition_attention,
                self.dtype,
                attn_min_t=self.attn_min_t,
                attn_impl=self.attn_impl,
                conv_impl=self.conv_impl,
                name=f"block_{i}",
            )(x, mask_b_t, train, rope_cs=rope_cs)
        return x * mask_b_t[:, :, None].astype(x.dtype)
