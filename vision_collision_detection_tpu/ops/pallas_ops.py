"""Pallas TPU kernels for the preprocessing hot path.

``fused_dequant_normalize_pad``: uint8 letterbox-content frames →
normalized bf16 square frames in ONE pass through VMEM. The XLA fallback
path (/255 → pad → normalize → cast) materializes an fp32 intermediate of
the full square frame in HBM between fusions; this kernel reads each uint8
content frame once, writes each bf16 output frame once — the minimum
possible HBM traffic for the op (the eval-preprocess path is pure bandwidth).

Layout: frames are processed as 2-D [H, W*3] blocks (channel-packed rows) so
the innermost dimension is lane-contiguous; per-channel mean/std become a
[W*3] pattern row computed once per kernel instance with an iota%3 select.

Used automatically by ops.preprocess.eval_preprocess on TPU when the input
is already content-sized (decoder shipped content rows); CPU tests run the
same kernel in interpreter mode against the XLA reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pattern_row(width3: int, values3, dtype):
    """[1, width3] row repeating (v0, v1, v2) per channel-packed pixel.

    values3 must be Python floats (compile-time literals — pallas kernels
    cannot capture array constants)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, width3), 1) % 3
    v0, v1, v2 = (dtype(float(v)) for v in values3)
    return jnp.where(ch == 0, v0, jnp.where(ch == 1, v1, v2))


def _kernel(in_ref, out_ref, *, ch, cw3, S, S3, pad_h, pad_w3, mean, std,
            out_dtype):
    inv255_std = _pattern_row(cw3, [1.0 / (255.0 * s) for s in std],
                              jnp.float32)
    bias = _pattern_row(cw3, [-m / s for m, s in zip(mean, std)], jnp.float32)
    pad_row = _pattern_row(S3, [-m / s for m, s in zip(mean, std)],
                           jnp.float32).astype(out_dtype)

    # black bars: the normalized value of 0
    out_ref[0] = jnp.broadcast_to(pad_row, (S, S3))
    # Mosaic has no direct uint8→f32 cast; widen through int32 first.
    x = in_ref[0].astype(jnp.int32).astype(jnp.float32)
    y = x * inv255_std + bias
    out_ref[0, pad_h:pad_h + ch, pad_w3:pad_w3 + cw3] = y.astype(out_dtype)


def fused_dequant_normalize_pad(frames_u8: jax.Array, target_size: int,
                                mean, std, out_dtype=jnp.bfloat16,
                                interpret: bool = False) -> jax.Array:
    """uint8 [..., ch, cw, 3] content frames → [..., S, S, 3] normalized.

    Content is centered with the reference's ``(S - c) // 2`` padding
    arithmetic (/root/reference/nexar_video_aug.py:718-719). Requires
    ch <= S and cw <= S (content already scaled by the decoder).
    """
    *lead, ch, cw, c = frames_u8.shape
    if c != 3:
        raise ValueError(f"expected packed RGB, got {c} channels")
    S = int(target_size)
    if ch > S or cw > S:
        raise ValueError(f"content {ch}x{cw} exceeds target {S}")
    pad_h = (S - ch) // 2
    pad_w = (S - cw) // 2
    n = int(np.prod(lead)) if lead else 1
    flat = frames_u8.reshape(n, ch, cw * 3)

    kernel = functools.partial(
        _kernel, ch=ch, cw3=cw * 3, S=S, S3=S * 3, pad_h=pad_h,
        pad_w3=pad_w * 3, mean=tuple(float(m) for m in mean),
        std=tuple(float(s) for s in std), out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, ch, cw * 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, S * 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, S, S * 3), out_dtype),
        interpret=interpret,
    )(flat)
    return out.reshape(*lead, S, S, 3)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"
