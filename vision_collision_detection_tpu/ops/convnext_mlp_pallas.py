"""Fused ConvNeXt-block MLP (LayerNorm → pwconv1 → GELU → pwconv2 →
layer-scale → residual add) as one Pallas TPU kernel.

Why it was built: the on-chip profile (PROFILE_r04.json) shows the
flagship convnext_tiny train step spending 424 of 557 busy-ms in
convolution fusions at flax's linear.py:287/700 — the pointwise 1x1
"convs" (Dense over channels). At stage-0/1 shapes ([B·T·56·56, 96] @
[96, 384]) each matmul's arithmetic intensity (~76 flops/byte) is far
under the v5e ridge (~240), so the hypothesis was an HBM-traffic win
from keeping the whole LN→MLP→scale→residual chain in VMEM.

What the A/B actually found (scripts/bench_fused_mlp.py, v5e): XLA's
fusion pipeline already runs the stage-0/1 chain AT the HBM roofline
(2.1 ms vs this kernel's 8.6 ms at stage 0), the kernel only wins in
isolation at C>=768 (1.13 vs 1.45 ms, ~83% MXU), and in the full model
even that win is eaten by pad/layout-copy glue at the custom-call
boundary. See FUSED_MLP_DEFAULT below — this is a kept, documented
negative result with its tests; opt in via ConvNeXtBlock(fused_mlp=True).

The depthwise 7x7 stays on XLA's grouped-conv lowering: it is VPU-bound
near its ceiling already (ops/dwconv_pallas.py documents the measured
negative result for a Pallas dwconv).

Numerics: LayerNorm statistics in f32 (as flax does); matmuls take bf16
inputs with f32 MXU accumulation; GELU (exact erf or tanh approx,
matching the block's `gelu_approximate`) is applied in f32 before the
bf16 downcast — at least as accurate as the unfused bf16 XLA path, and
pinned against it in tests/test_convnext_fused_mlp.py.

Backward: jax.custom_vjp. The forward kernel emits the LN output `t`,
the pre-GELU activation `h_pre`, and the pre-residual MLP output `m`
(all bf16, exactly the tensors XLA's autodiff would have saved), so the
backward is the standard 4-matmul gradient chain expressed in plain jnp
— XLA schedules it as today. dgamma uses the saved `m`; d(shortcut) is
the incoming gradient unchanged.

Reference block being accelerated: /root/reference/nexar_arch.py's
torchvision convnext backbones (block = dwconv + LN + 4x MLP + layer
scale + residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_collision_detection_tpu.ops.dwconv_pallas import on_tpu

LN_EPS = 1e-6

# MEASURED NEGATIVE RESULT — default stays False (same discipline as
# ops/dwconv_pallas.py). Isolated stage-3 geometry wins (table below), but
# in the full flagship model the win is eaten by glue around the custom
# call: XLA pads each operand to the row-tile multiple and inserts
# layout copies at the custom-call boundary (visible as %pad/%copy-done in
# the HLO), and eval B=16 measured 107.7 ms fused vs 96.1 ms XLA with
# train a wash (566.5 vs 561.1 ms at B=32). ConvNeXtBlock(fused_mlp=True)
# opts in per-experiment; scripts/bench_fused_mlp.py reproduces the
# per-stage numbers.
FUSED_MLP_DEFAULT = False

# Stage gating from the on-chip per-stage A/B (scripts/bench_fused_mlp.py,
# flagship geometry, v5e): at stage-0/1 ([1.25M,96] / [314K,192]) BOTH
# impls sit on the HBM roofline and XLA's fusion pipeline is 2.5-3x faster
# than this kernel's grid (measured 2.1 vs 8.6 ms at stage 0 — an honest
# NEGATIVE result: XLA already runs the memory-bound chain at
# speed-of-light there); at C=384 the two are within noise fwd and XLA
# wins fwd+bwd; at C=768 the weights-resident kernel wins clearly
# (fwd 1.13 vs 1.45 ms, 164 TF/s ≈ 83% MXU; data-grad leg 0.73 vs 1.07).
# So the kernel engages only at C>=768: convnext_tiny stage 3, base
# stage 3 (1024), large stages 2-3 (768/1536).
FUSED_MLP_MIN_DIM = 768


def _row_tile(c: int, extra_outs: bool) -> int:
    """Rows per grid step, sized so double-buffered in/out tiles + both
    weight matrices + the [R, 4C] intermediate fit the 16 MB scoped-VMEM
    limit (R=2048 at C=192 was measured 628 KB over it). Training tiles
    (extra_outs: t/h_pre/m also written) get half the rows."""
    if c <= 128:
        r = 2048
    elif c <= 256:
        r = 1024
    elif c <= 512:
        r = 512
    else:
        r = 256
    return r // 2 if extra_outs else r


def _ln_mlp(y_f32, s, b, w1_ref, b1_ref, w2_ref, b2_ref, approximate):
    """Shared fwd math on one [R, C] f32 tile → (t bf16, h_pre f32, m f32)."""
    mu = jnp.mean(y_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y_f32 - mu), axis=-1, keepdims=True)
    xhat = (y_f32 - mu) * jax.lax.rsqrt(var + LN_EPS)
    t = (xhat * s + b).astype(jnp.bfloat16)
    h_pre = (jnp.dot(t, w1_ref[...], preferred_element_type=jnp.float32)
             + b1_ref[...]).astype(jnp.bfloat16)
    # GELU on bf16: the transcendental is the kernel's VPU bottleneck at
    # f32 (measured 3x slowdown at stage-0 geometry), and the unfused flax
    # path applies gelu to the Dense's bf16 output anyway — bf16 here is
    # both faster and numerically closer to the path being replaced.
    h = jax.nn.gelu(h_pre, approximate=approximate)
    m = jnp.dot(h, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    return t, h_pre, m


def _eval_kernel(x_ref, y_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 g_ref, o_ref, *, approximate):
    _, _, m = _ln_mlp(y_ref[...].astype(jnp.float32), s_ref[...], b_ref[...],
                      w1_ref, b1_ref, w2_ref, b2_ref, approximate)
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  + g_ref[...] * m).astype(o_ref.dtype)


def _train_kernel(x_ref, y_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  g_ref, o_ref, t_ref, hpre_ref, m_ref, *, approximate):
    t, h_pre, m = _ln_mlp(y_ref[...].astype(jnp.float32), s_ref[...],
                          b_ref[...], w1_ref, b1_ref, w2_ref, b2_ref,
                          approximate)
    t_ref[...] = t
    hpre_ref[...] = h_pre.astype(jnp.bfloat16)
    m_ref[...] = m.astype(jnp.bfloat16)
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  + g_ref[...] * m).astype(o_ref.dtype)


def _pad_rows(a, m_pad):
    return a if a.shape[0] == m_pad else jnp.pad(
        a, ((0, m_pad - a.shape[0]), (0, 0)))


def _call(kernel, x2, y2, params, approximate, extra_outs):
    """Run `kernel` over row tiles of the flattened [M, C] problem."""
    s, b, w1, b1, w2, b2, g = params
    m_rows, c = x2.shape
    hid = w1.shape[1]
    r = min(_row_tile(c, extra_outs),
            max(128, ((m_rows + 15) // 16) * 16))
    m_pad = ((m_rows + r - 1) // r) * r
    x2, y2 = _pad_rows(x2, m_pad), _pad_rows(y2, m_pad)
    row_spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((m_pad, c), x2.dtype)]
    out_specs = [row_spec]
    if extra_outs:
        out_shapes += [jax.ShapeDtypeStruct((m_pad, c), jnp.bfloat16),
                       jax.ShapeDtypeStruct((m_pad, hid), jnp.bfloat16),
                       jax.ShapeDtypeStruct((m_pad, c), jnp.bfloat16)]
        out_specs += [row_spec,
                      pl.BlockSpec((r, hid), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      row_spec]
    outs = pl.pallas_call(
        functools.partial(kernel, approximate=approximate),
        out_shape=tuple(out_shapes),
        grid=(m_pad // r,),
        in_specs=[
            row_spec, row_spec,
            const((1, c)), const((1, c)),
            const((c, hid)), const((1, hid)),
            const((hid, c)), const((1, c)),
            const((1, c)),
        ],
        out_specs=tuple(out_specs),
        interpret=not on_tpu(),
    )(x2, y2, s.reshape(1, c).astype(jnp.float32),
      b.reshape(1, c).astype(jnp.float32),
      w1.astype(jnp.bfloat16), b1.reshape(1, hid).astype(jnp.float32),
      w2.astype(jnp.bfloat16), b2.reshape(1, c).astype(jnp.float32),
      g.reshape(1, c).astype(jnp.float32))
    return tuple(o[:m_rows] for o in outs)


def _flatten(a):
    return a.reshape(-1, a.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def convnext_mlp_block(x, y, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                       approximate=False):
    """x + gamma * pwconv2(gelu(pwconv1(LN(y)))) with everything after the
    depthwise conv fused into one VMEM-resident kernel.

    x, y: [..., C] (shortcut and dwconv output); w1 [C, 4C]; w2 [4C, C].
    Returns [..., C] in x.dtype.
    """
    shape = x.shape
    (o,) = _call(_eval_kernel, _flatten(x), _flatten(y),
                 (ln_scale, ln_bias, w1, b1, w2, b2, gamma),
                 approximate, extra_outs=False)
    return o.reshape(shape)


def _fwd(x, y, ln_scale, ln_bias, w1, b1, w2, b2, gamma, approximate):
    shape = x.shape
    o, t, h_pre, m = _call(_train_kernel, _flatten(x), _flatten(y),
                           (ln_scale, ln_bias, w1, b1, w2, b2, gamma),
                           approximate, extra_outs=True)
    res = (_flatten(y), t, h_pre, m, ln_scale, w1, w2, gamma, shape)
    return o.reshape(shape), res


def _bwd(approximate, res, g):
    y2, t, h_pre, m, ln_scale, w1, w2, gamma, shape = res
    c = y2.shape[-1]
    g2 = _flatten(g).astype(jnp.bfloat16)
    gamma_b = gamma.reshape(1, c)

    dgamma = jnp.sum(g2.astype(jnp.float32) * m.astype(jnp.float32),
                     axis=0).astype(gamma.dtype)
    v = (g2 * gamma_b.astype(jnp.bfloat16))  # grad into pwconv2 output
    h = jax.nn.gelu(h_pre, approximate=approximate)  # bf16, as in forward
    dw2 = jnp.dot(h.T, v, preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(v.astype(jnp.float32), axis=0)
    dh = jnp.dot(v, w2.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32)
    _, gelu_vjp = jax.vjp(
        lambda z: jax.nn.gelu(z, approximate=approximate),
        h_pre.astype(jnp.float32))
    (dh_pre,) = gelu_vjp(dh)
    dh_pre_b = dh_pre.astype(jnp.bfloat16)
    dw1 = jnp.dot(t.T, dh_pre_b,
                  preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dh_pre, axis=0)
    dt = jnp.dot(dh_pre_b, w1.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32)

    # LayerNorm backward, stats recomputed in f32 from the saved input.
    yf = y2.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (yf - mu) * rstd
    dscale = jnp.sum(dt * xhat, axis=0).astype(ln_scale.dtype)
    dbias = jnp.sum(dt, axis=0)
    dxhat = dt * ln_scale.reshape(1, c).astype(jnp.float32)
    dy = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))

    dx = g  # residual shortcut
    return (dx, dy.astype(y2.dtype).reshape(shape), dscale,
            dbias.astype(ln_scale.dtype), dw1, db1.astype(w1.dtype), dw2,
            db2.astype(w2.dtype), dgamma)


convnext_mlp_block.defvjp(_fwd, _bwd)
