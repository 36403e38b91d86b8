"""Fused post-attention block (Pallas TPU): out-proj + residual + LN1 +
FFN + residual + LN2, forward AND backward.

One EncoderLayer pass through the XLA path materializes, per layer and
direction, the out-projection output, the residual sum, the LN1 output,
the FFN hidden ([*, 256] — the widest tensor of the layer), the FFN
output, and the second residual sum — ~400 MB of HBM round-trips per
decoder-scale layer pass that XLA cannot fuse because each ``dot`` is its
own fusion root.  This kernel reads the residual stream ``x`` and the raw
attention output once, keeps every intermediate in VMEM (all layer
weights total ~330 KB — trivially VMEM-resident), and writes only the
block output.  The backward kernel recomputes the forward from the same
two inputs (recompute is free here: the step is bandwidth-bound, the MXU
is idle) and accumulates the weight gradients in f32 VMEM scratch across
the whole grid, flushing once per parameter group.

Math matches ``models/sst.EncoderLayer`` (reference semantics:
``/root/reference/mmdet3d/models/sst/sst_basic_block.py:84-102``):

  o   = attn @ Wo + bo                       (post out-projection)
  xm  = LN1(x + o)                           (post-norm residual)
  y   = LN2(xm + gelu_exact(xm @ W1 + b1) @ W2 + b2)

with the same dtype discipline as the XLA path: matmuls accumulate f32
and cast to the compute dtype, LayerNorm statistics in f32 (eps 1e-5),
LN scale/bias f32, erf-exact GELU.

Grouped stacks (the batched GeoMAE decoder pair) pass weights with a
leading group axis [G, ...] and tokens group-major [G*Bb, V, C]; the
weight BlockSpecs select group ``b // Bb`` so consecutive grid steps
reuse the resident weights (Pallas skips re-fetch while the block index
is unchanged).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256
_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


# Mosaic has no erf lowering; this is XLA's own f32 rational (the Eigen
# polynomial ErfImpl32 in xla/client/lib/math.cc), so values match the
# XLA path to the last ulp on [-4, 4] and saturate identically outside.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + c
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + c
    return x * p / q


def _gelu(x):
    """erf-exact GELU on f32 (torch ``F.gelu`` default)."""
    return 0.5 * x * (1.0 + _erf_f32(x * _SQRT_HALF))


def _dgelu(x):
    cdf = 0.5 * (1.0 + _erf_f32(x * _SQRT_HALF))
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return cdf + x * pdf


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_f32(zf, scale, bias, eps):
    mu = jnp.mean(zf, axis=-1, keepdims=True)
    var = jnp.mean(zf * zf, axis=-1, keepdims=True) - mu * mu
    rs = jax.lax.rsqrt(var + eps)
    xhat = (zf - mu) * rs
    return xhat, rs, xhat * scale + bias


def _recompute(x_ref, a_ref, wo_ref, bo_ref, s1_ref, t1_ref, w1_ref,
               b1_ref, w2_ref, b2_ref, eps):
    """Shared forward chain up to (and including) the LN2 input."""
    x = x_ref[0]                                    # [tile, C] dtype
    at = a_ref[0]
    dt = x.dtype
    # weight blocks are (1, r, c); [0] derefs to (r, c) / (1, c) for biases
    o = _dot(at, wo_ref[0], ((1,), (0,))).astype(dt) + bo_ref[0]
    z = x + o
    zf = z.astype(jnp.float32)
    xhat1, rs1, xm_f = _ln_f32(zf, s1_ref[0], t1_ref[0], eps)
    xm = xm_f.astype(dt)
    a1 = (_dot(xm, w1_ref[0], ((1,), (0,))).astype(dt) + b1_ref[0])
    a1f = a1.astype(jnp.float32)
    h = _gelu(a1f).astype(dt)
    o2 = _dot(h, w2_ref[0], ((1,), (0,))).astype(dt) + b2_ref[0]
    z2 = xm + o2
    z2f = z2.astype(jnp.float32)
    return x, at, xhat1, rs1, xm, a1f, h, z2f


def _fwd_kernel(nv_ref, x_ref, a_ref, wo_ref, bo_ref, s1_ref, t1_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, t2_ref, y_ref, *,
                eps, tile):
    # nv = per-sample extent: tiles past the last real token (the
    # tile-packed layout's trailing slack) skip compute entirely
    cur_valid = pl.program_id(1) * tile < nv_ref[pl.program_id(0)]

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    @pl.when(cur_valid)
    def _():
        (x, _at, _xh1, _rs1, _xm, _a1f, _h, z2f) = _recompute(
            x_ref, a_ref, wo_ref, bo_ref, s1_ref, t1_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, eps)
        _xhat2, _rs2, y_f = _ln_f32(z2f, s2_ref[0], t2_ref[0], eps)
        y_ref[0] = y_f.astype(x.dtype)


def _bwd_kernel(nv_ref, x_ref, a_ref, dy_ref, wo_ref, bo_ref, s1_ref,
                t1_ref, w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, t2_ref,
                dx_ref, da_ref, dwo_ref, dbo_ref, ds1_ref, dt1_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, ds2_ref, dt2_ref,
                wo_acc, bo_acc, s1_acc, t1_acc, w1_acc, b1_acc, w2_acc,
                b2_acc, s2_acc, t2_acc, sems, *, eps, bb, tile):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    cur_valid = i * tile < nv_ref[b]

    accs = (wo_acc, bo_acc, s1_acc, t1_acc, w1_acc, b1_acc, w2_acc, b2_acc,
            s2_acc, t2_acc)
    outs = (dwo_ref, dbo_ref, ds1_ref, dt1_ref, dw1_ref, db1_ref, dw2_ref,
            db2_ref, ds2_ref, dt2_ref)

    @pl.when((jax.lax.rem(b, bb) == 0) & (i == 0))
    def _():
        for acc in accs:
            acc[...] = jnp.zeros_like(acc)

    @pl.when(jnp.logical_not(cur_valid))
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)
        da_ref[...] = jnp.zeros_like(da_ref)

    @pl.when(cur_valid)
    def _body():
        _bwd_body(x_ref, a_ref, dy_ref, wo_ref, bo_ref, s1_ref, t1_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, t2_ref, dx_ref,
                  da_ref, wo_acc, bo_acc, s1_acc, t1_acc, w1_acc, b1_acc,
                  w2_acc, b2_acc, s2_acc, t2_acc, eps)

    @pl.when((jax.lax.rem(b, bb) == bb - 1) & (i == nt - 1))
    def _():
        g = b // bb
        for j, (acc, out) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(acc, out.at[g], sems.at[j]).start()
        for j, (acc, out) in enumerate(zip(accs, outs)):
            pltpu.make_async_copy(acc, out.at[g], sems.at[j]).wait()


def _bwd_body(x_ref, a_ref, dy_ref, wo_ref, bo_ref, s1_ref, t1_ref,
              w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, t2_ref, dx_ref,
              da_ref, wo_acc, bo_acc, s1_acc, t1_acc, w1_acc, b1_acc,
              w2_acc, b2_acc, s2_acc, t2_acc, eps):
    x, at, xhat1, rs1, xm, a1f, h, z2f = _recompute(
        x_ref, a_ref, wo_ref, bo_ref, s1_ref, t1_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, eps)
    dt = x.dtype
    s1 = s1_ref[0]                                  # (1, C) f32
    s2 = s2_ref[0]

    mu2 = jnp.mean(z2f, axis=-1, keepdims=True)
    var2 = jnp.mean(z2f * z2f, axis=-1, keepdims=True) - mu2 * mu2
    rs2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (z2f - mu2) * rs2

    dyf = dy_ref[0].astype(jnp.float32)
    # LN2 backward (models/norm._ln_bwd)
    g2 = dyf * s2
    mg2 = jnp.mean(g2, axis=-1, keepdims=True)
    mgx2 = jnp.mean(g2 * xhat2, axis=-1, keepdims=True)
    dz2 = (rs2 * (g2 - mg2 - xhat2 * mgx2)).astype(dt)
    s2_acc[...] += jnp.sum(dyf * xhat2, axis=0, keepdims=True)
    t2_acc[...] += jnp.sum(dyf, axis=0, keepdims=True)

    # z2 = xm + (h @ W2 + b2)
    dz2f = dz2.astype(jnp.float32)
    b2_acc[...] += jnp.sum(dz2f, axis=0, keepdims=True)
    dh = _dot(dz2, w2_ref[0], ((1,), (1,))).astype(dt)       # [tile, F]
    w2_acc[...] += _dot(h, dz2, ((0,), (0,)))                # [F, C]
    da1 = (dh.astype(jnp.float32) * _dgelu(a1f)).astype(dt)
    da1f = da1.astype(jnp.float32)
    b1_acc[...] += jnp.sum(da1f, axis=0, keepdims=True)
    w1_acc[...] += _dot(xm, da1, ((0,), (0,)))               # [C, F]
    dxm_ffn = _dot(da1, w1_ref[0], ((1,), (1,))).astype(dt)  # [tile, C]
    dxm = (dz2 + dxm_ffn).astype(jnp.float32)

    # LN1 backward
    g1 = dxm * s1
    mg1 = jnp.mean(g1, axis=-1, keepdims=True)
    mgx1 = jnp.mean(g1 * xhat1, axis=-1, keepdims=True)
    dz1 = (rs1 * (g1 - mg1 - xhat1 * mgx1)).astype(dt)
    s1_acc[...] += jnp.sum(dxm * xhat1, axis=0, keepdims=True)
    t1_acc[...] += jnp.sum(dxm, axis=0, keepdims=True)

    # z = x + (attn @ Wo + bo)
    dz1f = dz1.astype(jnp.float32)
    bo_acc[...] += jnp.sum(dz1f, axis=0, keepdims=True)
    dat = _dot(dz1, wo_ref[0], ((1,), (1,)))                 # [tile, C]
    wo_acc[...] += _dot(at, dz1, ((0,), (0,)))               # [C, C]
    dx_ref[0] = dz1
    da_ref[0] = dat.astype(dt)


def _specs(B, V, C, F, tile, bb):
    tok = lambda: pl.BlockSpec((1, tile, C), lambda b, i, *_: (b, i, 0),
                               memory_space=pltpu.VMEM)
    grp = lambda r, c: pl.BlockSpec((1, r, c),
                                    lambda b, i, *_: (b // bb, 0, 0),
                                    memory_space=pltpu.VMEM)
    weights = [grp(C, C), grp(1, C),            # wo, bo
               grp(1, C), grp(1, C),            # s1, t1
               grp(C, F), grp(1, F),            # w1, b1
               grp(F, C), grp(1, C),            # w2, b2
               grp(1, C), grp(1, C)]            # s2, t2
    return tok, weights


def _prep_weights(dtype, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2):
    """Cast to the kernel's operand dtypes; biases ride a [G, 1, F] axis."""
    f = jnp.float32
    return (wo.astype(dtype), bo.astype(dtype)[:, None],
            s1.astype(f)[:, None], t1.astype(f)[:, None],
            w1.astype(dtype), b1.astype(dtype)[:, None],
            w2.astype(dtype), b2.astype(dtype)[:, None],
            s2.astype(f)[:, None], t2.astype(f)[:, None])


def _nv_or_full(nv, B, V):
    if nv is None:
        return jnp.full((B,), V, jnp.int32)
    return nv.astype(jnp.int32)


def _forward(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv, eps,
             tile, interpret):
    B, V, C = x.shape
    G = wo.shape[0]
    F = w1.shape[-1]
    assert B % G == 0 and V % tile == 0, (B, G, V, tile)
    bb = B // G
    tok, weights = _specs(B, V, C, F, tile, bb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, V // tile),
        in_specs=[tok(), tok()] + weights,
        out_specs=tok(),
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, V, C), x.dtype),
        interpret=interpret,
    )(_nv_or_full(nv, B, V), x, attn,
      *_prep_weights(x.dtype, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2))
    return y


def _backward(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv, dy,
              eps, tile, interpret):
    B, V, C = x.shape
    G = wo.shape[0]
    F = w1.shape[-1]
    bb = B // G
    tok, weights = _specs(B, V, C, F, tile, bb)
    f = jnp.float32
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = (
        jax.ShapeDtypeStruct((B, V, C), x.dtype),      # dx
        jax.ShapeDtypeStruct((B, V, C), x.dtype),      # dattn
        jax.ShapeDtypeStruct((G, C, C), f),            # dwo
        jax.ShapeDtypeStruct((G, 1, C), f),            # dbo
        jax.ShapeDtypeStruct((G, 1, C), f),            # ds1
        jax.ShapeDtypeStruct((G, 1, C), f),            # dt1
        jax.ShapeDtypeStruct((G, C, F), f),            # dw1
        jax.ShapeDtypeStruct((G, 1, F), f),            # db1
        jax.ShapeDtypeStruct((G, F, C), f),            # dw2
        jax.ShapeDtypeStruct((G, 1, C), f),            # db2
        jax.ShapeDtypeStruct((G, 1, C), f),            # ds2
        jax.ShapeDtypeStruct((G, 1, C), f),            # dt2
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, V // tile),
        in_specs=[tok(), tok(), tok()] + weights,
        out_specs=(tok(), tok()) + (anyspec,) * 10,
        scratch_shapes=[
            pltpu.VMEM((C, C), f), pltpu.VMEM((1, C), f),
            pltpu.VMEM((1, C), f), pltpu.VMEM((1, C), f),
            pltpu.VMEM((C, F), f), pltpu.VMEM((1, F), f),
            pltpu.VMEM((F, C), f), pltpu.VMEM((1, C), f),
            pltpu.VMEM((1, C), f), pltpu.VMEM((1, C), f),
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, bb=bb, tile=tile),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(_nv_or_full(nv, B, V), x, attn, dy,
      *_prep_weights(x.dtype, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2))
    (dx, dattn, dwo, dbo, ds1, dt1, dw1, db1, dw2, db2, ds2, dt2) = outs
    sq = lambda a: a[:, 0]
    return (dx, dattn, dwo, sq(dbo), sq(ds1), sq(dt1), dw1, sq(db1), dw2,
            sq(db2), sq(ds2), sq(dt2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def post_attention_block(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2,
                         nv=None, eps: float = 1e-5,
                         tile: int = DEFAULT_TILE,
                         interpret: bool = False):
    """Fused ``LN2(LN1(x + attn@Wo+bo) + FFN(...))`` (module docstring).

    ``x``/``attn``: [B, V, C] in the compute dtype.  Weights carry a
    leading group axis [G, ...] with ``B % G == 0`` and tokens
    group-major (G=1 for ungrouped layers); LN params are f32.
    """
    return _forward(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv,
                    eps, tile, interpret)


def _vjp_fwd(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv, eps,
             tile, interpret):
    y = _forward(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv,
                 eps, tile, interpret)
    return y, (x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv)


def _vjp_bwd(eps, tile, interpret, res, dy):
    x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv = res
    grads = _backward(x, attn, wo, bo, s1, t1, w1, b1, w2, b2, s2, t2, nv,
                      dy, eps, tile, interpret)
    (dx, dattn, dwo, dbo, ds1, dt1, dw1, db1, dw2, db2, ds2, dt2) = grads
    cast = lambda g, p: g.astype(p.dtype)
    return (dx, dattn, cast(dwo, wo), cast(dbo, bo), cast(ds1, s1),
            cast(dt1, t1), cast(dw1, w1), cast(db1, b1), cast(dw2, w2),
            cast(db2, b2), cast(ds2, s2), cast(dt2, t2), None)


post_attention_block.defvjp(_vjp_fwd, _vjp_bwd)
