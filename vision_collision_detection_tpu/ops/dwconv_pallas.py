"""Pallas depthwise 7x7 convolution (NHWC, stride 1, SAME) with custom VJP.

The on-chip profile (PROFILE_r03.json) shows XLA's depthwise-convolution
lowering running at ~1.8 TFLOP/s effective — 113 ms of the flagship
convnext_tiny train step — because grouped convs execute as vector
convolutions with poor data reuse. Depthwise conv is elementwise work with
a 7x7 halo: the right TPU shape is a VPU kernel that keeps one padded
frame resident in VMEM and applies the 49 taps as shifted fused
multiply-adds — every tap reads VMEM, HBM traffic is ~1x the tensor size.
A full ConvNeXt frame fits easily (stage0: [62, 62, 96] bf16 ≈ 0.7 MB of
~16 MB VMEM), so the grid runs over frames with no halo exchange.

Forward, input-gradient (correlation with the spatially-flipped kernel),
and weight-gradient (per-tap reduction, sequentially accumulated over the
grid's frame dimension — TPU grids iterate sequentially, so revisiting the
output block is safe) are all Pallas kernels wired into jax.custom_vjp.
f32 accumulation regardless of input dtype (matches XLA conv semantics).

Used by the ConvNeXt blocks (models/backbones/convnext.py) on TPU;
numerics pinned against lax.conv_general_dilated in tests/test_dwconv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7  # kernel size (ConvNeXt block dwconv)
PAD = K // 2


def on_tpu() -> bool:
    """True when the default backend is real TPU hardware (the pallas
    kernels compile); any other backend runs the interpreter."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Measured on chip (v5 lite, B=16 flagship eval): this kernel ran SLOWER
# than XLA's grouped-conv lowering (159.6 ms vs 95.7 ms eval step) and the
# custom-VJP backward failed to compile through the remote toolchain.
# Depthwise 7x7 is VPU-FLOP-bound (~98 flops/element); XLA's ~1.8 TFLOP/s
# is already near the VPU ceiling, so there is no MXU win to be had and
# the shifted unaligned reads cost more than XLA's schedule. Kept as an
# opt-in experiment (ConvNeXtBlock(dwconv_pallas=True)); the default stays
# on the XLA path everywhere.
PALLAS_DWCONV_DEFAULT = False


def _interpret() -> bool:
    return not on_tpu()



def _fwd_kernel(x_ref, w_ref, b_ref, out_ref):
    # x_ref: [1, H+6, W+6, C] padded frame; w_ref: [49, C]; b_ref: [1, C]
    # out_ref: [1, H, W, C]
    h = out_ref.shape[1]
    w_out = out_ref.shape[2]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tile = x_ref[0, dy:dy + h, dx:dx + w_out, :].astype(jnp.float32)
            acc += tile * w_ref[dy * K + dx, :].astype(jnp.float32)
    acc += b_ref[0, :].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _run_fwd(xp, w2d, b2d):
    """xp: pre-padded [N, H+6, W+6, C]; w2d [49, C]; b2d [1, C] →
    [N, H, W, C] in xp's dtype."""
    n, hp, wp, c = xp.shape
    h, w_out = hp - 2 * PAD, wp - 2 * PAD
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w_out, c), xp.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_out, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xp, w2d, b2d)


def _wgrad_kernel(xp_ref, g_ref, dw_ref):
    # xp_ref: [1, H+6, W+6, C]; g_ref: [1, H, W, C]; dw_ref: [49, C] f32.
    h = g_ref.shape[1]
    w_out = g_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    g = g_ref[0].astype(jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tile = xp_ref[0, dy:dy + h, dx:dx + w_out, :].astype(jnp.float32)
            dw_ref[dy * K + dx, :] += jnp.sum(tile * g, axis=(0, 1))


def _run_wgrad(xp, g):
    n, hp, wp, c = xp.shape
    return pl.pallas_call(
        _wgrad_kernel,
        out_shape=jax.ShapeDtypeStruct((K * K, c), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp - 2 * PAD, wp - 2 * PAD, c),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K * K, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xp, g)


@jax.custom_vjp
def dwconv7x7(x, w, b):
    """Depthwise 7x7 SAME conv: x [N,H,W,C], w [7,7,C], b [C] → [N,H,W,C]."""
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return _run_fwd(xp, w.reshape(K * K, -1), b.reshape(1, -1))


def _dwconv_fwd(x, w, b):
    return dwconv7x7(x, w, b), (x, w)


def _dwconv_bwd(res, g):
    x, w = res
    c = w.shape[-1]
    # dx: stride-1 SAME depthwise conv is self-transpose under spatial flip.
    gp = jnp.pad(g, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    wf = w[::-1, ::-1, :].reshape(K * K, c)
    zero_b = jnp.zeros((1, c), g.dtype)
    dx = _run_fwd(gp, wf, zero_b).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    dw = _run_wgrad(xp, g).reshape(K, K, c).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


dwconv7x7.defvjp(_dwconv_fwd, _dwconv_bwd)
