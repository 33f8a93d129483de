"""Pallas flash attention for the ViViT spatial blocks (opt-in).

The factorized ViViT's spatial encoder attends over n_patches tokens per
frame (576 at 336²/14); XLA materializes the [B·T, heads, S, S] attention
matrix in HBM on both the forward and backward pass. The Pallas TPU flash
kernel (jax.experimental.pallas.ops.tpu.flash_attention) streams K/V tiles
through VMEM and recomputes the softmax in the backward pass, so the S×S
matrix never touches HBM — the classic FlashAttention trade (Dao et al.
2022) on the TPU memory hierarchy.

Opt-in via ``ModelConfig.attention_impl = "flash"`` (default "xla"): the
kernel requires a TPU backend and sequence lengths divisible by a ≥128
block, so the XLA path stays the portable default and the CPU test suite
exercises the wrapper's shape/fallback logic only. Parameter layout is
identical between the two impls (same DenseGeneral projections as
flax.linen.MultiHeadDotProductAttention), so checkpoints swap freely.

Measured A/B on TPU v5 lite (FLASH_AB_r04.json): at the flagship scaled
shape (336px → 576 tokens, head_dim 64) XLA's fused attention wins —
kernel-level flash is 0.68× (9.4 vs 6.4 ms fwd+bwd over 12 spatial
layers' shape [64,576,6,64]) and whole-train-step 0.33× (242 vs 80
ms/step at B=2/32f, the padding 576→640 and small 128 blocks both hurt).
Flash crosses over at ≥1024 tokens: 448px (seq exactly 1024, block 512)
gives 1.37× fwd / 1.10× fwd+bwd; 2304 tokens is parity (block 256 ceiling,
2304 = 9·256). Numerics are bf16-equivalent (post-step param rel diff
3.3e-4, eval prob rel diff 2.6e-5). Hence: default "xla"; reach for
"flash" only at ≥448px scaled configs.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _largest_block(seq_len: int, cap: int = 512) -> int | None:
    """Largest divisor of seq_len that is a multiple of 128 and ≤ cap.
    None when no such divisor exists (the caller pads first)."""
    for b in range(min(cap, seq_len), 127, -128):
        if b % 128 == 0 and seq_len % b == 0:
            return b
    return None


def _padded_len(seq_len: int) -> int:
    return -(-seq_len // 128) * 128


@functools.cache
def flash_supported(seq_len: int) -> bool:
    """True when the Pallas kernel can run: TPU backend + a useful length
    (non-multiples of 128 are handled by segment-id-masked padding)."""
    if seq_len < 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def flash_mha(q, k, v, sm_scale: float):
    """Self-attention via the Pallas TPU flash kernel.

    q/k/v: [batch, seq, heads, head_dim] (the flax attention layout);
    returns the same layout. Sequence lengths that aren't multiples of 128
    are zero-padded with segment-id masking (ViViT spatial seq is 576 at
    336²/14): pad tokens sit in segment 0, real tokens in segment 1, so no
    real row ever attends to padding and the sliced-back output is exact.
    Caller must have checked flash_supported().
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    seq = q.shape[1]
    padded = _padded_len(seq)
    blk = _largest_block(padded)
    batch = q.shape[0]
    segment_ids = None
    if padded != seq:
        pad = [(0, 0), (0, padded - seq), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        ids = (jnp.arange(padded) < seq).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (batch, padded))
        segment_ids = fa.SegmentIds(q=ids, kv=ids)
    sizes = fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    # kernel layout: [batch, heads, seq, head_dim]
    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    out = fa.flash_attention(qt, kt, vt, segment_ids=segment_ids,
                             sm_scale=sm_scale, block_sizes=sizes)
    return jnp.swapaxes(out, 1, 2)[:, :seq]


class FlashSelfAttention(nn.Module):
    """Drop-in self-attention with nn.MultiHeadDotProductAttention's exact
    parameter tree (query/key/value/out DenseGeneral), computing the
    attention itself with the Pallas flash kernel when supported and
    falling back to the standard XLA einsum path otherwise."""

    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        if dim % self.num_heads:
            raise ValueError(f"dim {dim} not divisible by heads {self.num_heads}")
        head_dim = dim // self.num_heads
        proj = functools.partial(
            nn.DenseGeneral, features=(self.num_heads, head_dim),
            axis=-1, dtype=self.dtype,
        )
        q = proj(name="query")(x)
        k = proj(name="key")(x)
        v = proj(name="value")(x)
        sm_scale = head_dim ** -0.5
        if flash_supported(x.shape[1]):
            out = flash_mha(q, k, v, sm_scale)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * sm_scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(features=dim, axis=(-2, -1),
                               dtype=self.dtype, name="out")(out)
