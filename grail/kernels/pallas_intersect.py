"""Pallas TPU kernel: brute-force ray/triangle-set intersection.

The vectorized analog of looping GeometricPrimitive::Intersect over every
primitive (what pbrt's exhaustive aggregatetest oracle does, and what any small
scene reduces to — src/shapes/trianglemesh.cpp Triangle::Intersect Möller-
Trumbore). Rays are tiled (8,128) onto the VPU; the triangle table lives in SMEM
and is streamed scalar-by-scalar through a fori_loop, so every op is a full-block
VPU op with no gathers. One kernel serves closest-hit and any-hit (occluded =
prim >= 0).

Differentiable via custom_vjp: backward recomputes with the pure-jnp reference
(kernels/intersect.py) and pulls cotangents through jax.vjp — the
"recompute-in-backward" strategy from SURVEY §7.3.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_T = jnp.float32(3.0e37)

BLOCK_ROWS = 8            # (8,128) f32 native tile → 1024 rays per grid step
LANES = 128
MAX_SMEM_TRIS = 1024      # (T,9) f32 in SMEM; 36 KB at the cap


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmin_ref, tmax_ref,
            t_out, prim_out, b1_out, b2_out):
    n_tris = tri_ref.shape[0]
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    tmin = tmin_ref[:]

    def body(k, carry):
        t_best, prim_best, b1_best, b2_best = carry
        v0x = tri_ref[k, 0]
        v0y = tri_ref[k, 1]
        v0z = tri_ref[k, 2]
        e1x = tri_ref[k, 3]
        e1y = tri_ref[k, 4]
        e1z = tri_ref[k, 5]
        e2x = tri_ref[k, 6]
        e2y = tri_ref[k, 7]
        e2z = tri_ref[k, 8]
        # s1 = d × e2
        s1x = d[1] * e2z - d[2] * e2y
        s1y = d[2] * e2x - d[0] * e2z
        s1z = d[0] * e2y - d[1] * e2x
        divisor = s1x * e1x + s1y * e1y + s1z * e1z
        inv = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
        sx = o[0] - v0x
        sy = o[1] - v0y
        sz = o[2] - v0z
        b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
        # s2 = s × e1
        s2x = sy * e1z - sz * e1y
        s2y = sz * e1x - sx * e1z
        s2z = sx * e1y - sy * e1x
        b2 = (d[0] * s2x + d[1] * s2y + d[2] * s2z) * inv
        t = (e2x * s2x + e2y * s2y + e2z * s2z) * inv
        hit = ((divisor != 0.0)
               & (b1 >= 0.0) & (b1 <= 1.0)
               & (b2 >= 0.0) & (b1 + b2 <= 1.0)
               & (t > tmin) & (t < t_best))
        t_best = jnp.where(hit, t, t_best)
        prim_best = jnp.where(hit, k, prim_best)
        b1_best = jnp.where(hit, b1, b1_best)
        b2_best = jnp.where(hit, b2, b2_best)
        return t_best, prim_best, b1_best, b2_best

    init = (tmax_ref[:],
            jnp.full(tmax_ref.shape, -1, jnp.int32),
            jnp.zeros(tmax_ref.shape, jnp.float32),
            jnp.zeros(tmax_ref.shape, jnp.float32))
    # Mosaic only supports full unroll; do it for small tables (hides the
    # scalar SMEM loads under the VPU work), loop otherwise.
    unroll = n_tris if n_tris <= 64 else 1
    t_best, prim_best, b1_best, b2_best = jax.lax.fori_loop(
        0, n_tris, body, init, unroll=unroll)
    t_out[:] = t_best
    prim_out[:] = prim_best
    b1_out[:] = b1_best
    b2_out[:] = b2_best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(tris9, o, d, tmin, tmax, interpret=False):
    n = o.shape[0]
    blk = BLOCK_ROWS * LANES
    n_pad = -(-n // blk) * blk
    rows = n_pad // LANES

    def field(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(rows, LANES)

    fields = [field(o[:, 0]), field(o[:, 1]), field(o[:, 2]),
              field(d[:, 0]), field(d[:, 1]), field(d[:, 2]),
              field(tmin), field(tmax)]

    spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    t, prim, b1, b2 = pl.pallas_call(
        _kernel,
        grid=(rows // BLOCK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 8,
        out_specs=[spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(tris9, *fields)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(prim), flat(b1), flat(b2)


def _reference(tris9, o, d, tmin, tmax):
    """Pure-jnp mirror of the kernel (backward pass + CPU testing)."""
    v0 = tris9[:, 0:3]
    e1 = tris9[:, 3:6]
    e2 = tris9[:, 6:9]
    from .intersect import moller_trumbore
    hit, t, b1, b2 = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
        tmin[:, None], tmax[:, None])
    t_masked = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(t_masked, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    any_hit = take(t_masked) < BIG_T
    return (jnp.where(any_hit, take(t), tmax),
            jnp.where(any_hit, best.astype(jnp.int32), -1),
            take(b1), take(b2))


@jax.custom_vjp
def brute_intersect_pallas(tris9, o, d, tmin, tmax):
    """Closest-hit over a packed (T,9) triangle table [v0|e1|e2].

    Returns (t, prim, b1, b2); prim == -1 on miss (t then == tmax; callers
    treat prim<0 as miss, matching intersect.py conventions)."""
    return _run(tris9, o, d, tmin, tmax)


def _fwd(tris9, o, d, tmin, tmax):
    out = _run(tris9, o, d, tmin, tmax)
    return out, (tris9, o, d, tmin, tmax)


def _bwd(res, cts):
    tris9, o, d, tmin, tmax = res

    def ref_diff(tris9, o, d, tmin, tmax):
        t, _, b1, b2 = _reference(tris9, o, d, tmin, tmax)
        return t, b1, b2

    _, vjp = jax.vjp(ref_diff, tris9, o, d, tmin, tmax)
    ct_t, _, ct_b1, ct_b2 = cts   # prim is integer-valued: cotangent dropped
    return vjp((ct_t, ct_b1, ct_b2))


brute_intersect_pallas.defvjp(_fwd, _bwd)


def pack_tris(scene):
    """(T,9) [v0|e1|e2] from the scene SoA (differentiable to verts)."""
    idx = scene["tri_idx"]
    v0 = scene["verts"][idx[:, 0]]
    v1 = scene["verts"][idx[:, 1]]
    v2 = scene["verts"][idx[:, 2]]
    return jnp.concatenate([v0, v1 - v0, v2 - v0], axis=-1)
