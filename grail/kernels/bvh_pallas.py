"""Pallas TPU BVH traversal — packet (ray-block) traversal with a shared
scalar stack.

pbrt traverses per ray with a per-thread todo[64] stack (bvh.cpp
BVHAccel::Intersect ~L520). A per-lane stack is hostile to the VPU (no
per-lane gather on TPU), so this kernel traverses per *block* of 1024 rays
(8x128 tile): one SMEM stack shared by the block, every node's slab test
evaluated for all 1024 rays at once on the VPU, and a node's subtree skipped
only when NO ray in the block intersects it. Near-child-first ordering uses
the block's majority ray-direction sign per axis — the packet analog of
pbrt's dirIsNeg[axis] ordering.

Memory layout: Mosaic only allows *static* lane indices, and any dynamically
indexed row costs a full 128-lane load — so records (10 f32 fields) are packed
12 per 128-lane row ([i // 12, (i % 12) * 10 + f], ~43 B/record), fetched as
one dynamic row load, and fields extracted with iota-mask reductions (pure
VPU work). Integer fields ride as f32 values (exact below 2^24). Triangles
are pre-ordered by BVH leaf order, so leaves index the tri table directly and
the original prim id is field 9 of the record.

The node + triangle tables must fit VMEM (~11 MB -> ~180k tris); larger
scenes fall back to bvh_traverse.py (an HBM-streaming variant is future
work).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8
LANES = 128
BLOCK = BLOCK_ROWS * LANES
STACK = 128
MAX_LEAF = 4
BIG_T = jnp.float32(3.0e37)

# VMEM budget for the resident node+tri tables (bytes); 12 records per 512 B
VMEM_TABLE_BUDGET = 11 * 1024 * 1024
RECS_PER_ROW = 12
REC_FIELDS = 10

# node record fields
_NF_BMIN = 0          # 0..2
_NF_BMAX = 3          # 3..5
_NF_RIGHT = 6
_NF_OFF = 7
_NF_NPRIMS = 8
_NF_AXIS = 9
# tri record fields: v0 (0..2), e1 (3..5), e2 (6..8), prim_id (9)


def _kernel(nodes_ref, tris_ref,
            ox, oy, oz, dx, dy, dz, tmin_ref, tmax_ref,
            t_out, prim_out, b1_out, b2_out, stack_ref):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    tmin = tmin_ref[:]
    inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-20,
                                jnp.where(c < 0, -1e-20, 1e-20), c)
                for c in d)

    # block-majority direction signs (packet analog of dirIsNeg[3])
    half = BLOCK // 2
    neg = [jnp.sum((c < 0).astype(jnp.int32)) > half for c in d]

    stack_ref[0] = 0

    lanes_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def fetch(ref, i):
        """One record: dynamic row load + per-field iota-mask extraction."""
        row = ref[i // RECS_PER_ROW, :][None, :]        # (1,128)
        base = (i % RECS_PER_ROW) * REC_FIELDS
        return [jnp.sum(jnp.where(lanes_iota == base + f, row, 0.0))
                for f in range(REC_FIELDS)]

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, t_best, prim_best, b1_best, b2_best = c
        node = stack_ref[sp - 1]
        sp = sp - 1

        rec = fetch(nodes_ref, node)
        bmnx, bmny, bmnz = rec[_NF_BMIN], rec[_NF_BMIN + 1], rec[_NF_BMIN + 2]
        bmxx, bmxy, bmxz = rec[_NF_BMAX], rec[_NF_BMAX + 1], rec[_NF_BMAX + 2]
        right = rec[_NF_RIGHT].astype(jnp.int32)
        off = rec[_NF_OFF].astype(jnp.int32)
        nprims = rec[_NF_NPRIMS].astype(jnp.int32)
        axis = rec[_NF_AXIS].astype(jnp.int32)

        # slab test for the whole block (bvh.cpp bounds test)
        tx0 = (bmnx - o[0]) * inv[0]
        tx1 = (bmxx - o[0]) * inv[0]
        ty0 = (bmny - o[1]) * inv[1]
        ty1 = (bmxy - o[1]) * inv[1]
        tz0 = (bmnz - o[2]) * inv[2]
        tz1 = (bmxz - o[2]) * inv[2]
        near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1)) * 1.0000004
        hit_box = (near <= far) & (far > tmin) & (near < t_best)
        any_hit = jnp.any(hit_box)

        is_leaf = nprims > 0

        # ---- leaf: stream up to MAX_LEAF triangles through the block
        leaf = any_hit & is_leaf
        for k in range(MAX_LEAF):
            valid = leaf & (k < nprims)
            trec = fetch(tris_ref, jnp.where(valid, off + k, 0))
            v0x, v0y, v0z = trec[0], trec[1], trec[2]
            e1x, e1y, e1z = trec[3], trec[4], trec[5]
            e2x, e2y, e2z = trec[6], trec[7], trec[8]
            pid = trec[9].astype(jnp.int32)
            s1x = d[1] * e2z - d[2] * e2y
            s1y = d[2] * e2x - d[0] * e2z
            s1z = d[0] * e2y - d[1] * e2x
            divisor = s1x * e1x + s1y * e1y + s1z * e1z
            dinv = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
            sx = o[0] - v0x
            sy = o[1] - v0y
            sz = o[2] - v0z
            b1 = (sx * s1x + sy * s1y + sz * s1z) * dinv
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            b2 = (d[0] * s2x + d[1] * s2y + d[2] * s2z) * dinv
            t = (e2x * s2x + e2y * s2y + e2z * s2z) * dinv
            hit = (valid & (divisor != 0.0)
                   & (b1 >= 0.0) & (b1 <= 1.0)
                   & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                   & (t > tmin) & (t < t_best))
            t_best = jnp.where(hit, t, t_best)
            prim_best = jnp.where(hit, pid, prim_best)
            b1_best = jnp.where(hit, b1, b1_best)
            b2_best = jnp.where(hit, b2, b2_best)

        # ---- interior: push far then near (near popped first)
        interior = any_hit & ~is_leaf
        dir_neg = jnp.where(axis == 0, neg[0],
                            jnp.where(axis == 1, neg[1], neg[2]))
        near_child = jnp.where(dir_neg, right, node + 1)
        far_child = jnp.where(dir_neg, node + 1, right)

        @pl.when(interior)
        def _():
            stack_ref[sp] = far_child
            stack_ref[sp + 1] = near_child

        sp = jnp.where(interior, jnp.minimum(sp + 2, STACK - 1), sp)
        return sp, t_best, prim_best, b1_best, b2_best

    init = (jnp.int32(1), tmax_ref[:],
            jnp.full(tmax_ref.shape, -1, jnp.int32),
            jnp.zeros(tmax_ref.shape, jnp.float32),
            jnp.zeros(tmax_ref.shape, jnp.float32))
    _, t_best, prim_best, b1_best, b2_best = jax.lax.while_loop(
        cond, body, init)
    t_out[:] = t_best
    prim_out[:] = prim_best
    b1_out[:] = b1_best
    b2_out[:] = b2_best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(nodes_tab, tris_tab, o, d, tmin, tmax, interpret=False):
    n = o.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    rows = n_pad // LANES

    def field(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(rows, LANES)

    fields = [field(o[:, 0]), field(o[:, 1]), field(o[:, 2]),
              field(d[:, 0]), field(d[:, 1]), field(d[:, 2]),
              field(tmin), field(tmax)]
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    t, prim, b1, b2 = pl.pallas_call(
        _kernel,
        grid=(rows // BLOCK_ROWS,),
        in_specs=[table_spec] * 2 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(nodes_tab, tris_tab, *fields)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(prim), flat(b1), flat(b2)


def _records(x):
    """(N, 10) -> (ceil(N/12), 128) packed record table (12 per row)."""
    n, f = x.shape
    assert f == REC_FIELDS
    m = -(-n // RECS_PER_ROW) * RECS_PER_ROW
    x = jnp.pad(x, ((0, m - n), (0, 0)))
    rows = x.reshape(m // RECS_PER_ROW, RECS_PER_ROW * REC_FIELDS)
    return jnp.pad(rows, ((0, 0), (0, LANES - RECS_PER_ROW * REC_FIELDS)))


def pack_bvh_tables(scene):
    """Flattened BVH SoA -> (nodes_tab, tris_tab) kernel tables.

    Triangles are re-ordered by BVH leaf order (prim_ids) so leaves address
    the table directly; the original prim id travels in field 9."""
    bvh = scene["bvh"]
    nodesf = jnp.concatenate([
        bvh["bounds_min"], bvh["bounds_max"],
        bvh["right"].astype(jnp.float32)[:, None],
        bvh["prim_off"].astype(jnp.float32)[:, None],
        bvh["nprims"].astype(jnp.float32)[:, None],
        bvh["axis"].astype(jnp.float32)[:, None],
    ], axis=1)
    from .pallas_intersect import pack_tris
    tris9 = pack_tris(scene)[bvh["prim_ids"]]
    tris10 = jnp.concatenate(
        [tris9, bvh["prim_ids"].astype(jnp.float32)[:, None]], axis=1)
    return _records(nodesf), _records(tris10)


def tables_fit_vmem(scene) -> bool:
    bvh = scene.get("bvh")
    if bvh is None:
        return False
    n_nodes = bvh["right"].shape[0]
    n_tris = scene["tri_idx"].shape[0]
    byt = (n_nodes + n_tris) * (512 // RECS_PER_ROW)
    return byt < VMEM_TABLE_BUDGET


@jax.custom_vjp
def bvh_intersect_packet(nodes_tab, tris_tab, tris9, o, d, tmin, tmax):
    """Closest hit via packet traversal. Returns (t, prim, b1, b2).

    tris9 is the unordered (T,9) [v0|e1|e2] table used only by the backward
    recompute (SURVEY §7.3 recompute-in-backward)."""
    return _run(nodes_tab, tris_tab, o, d, tmin, tmax)


def _fwd(nodes_tab, tris_tab, tris9, o, d, tmin, tmax):
    out = _run(nodes_tab, tris_tab, o, d, tmin, tmax)
    return out, (tris9, o, d, tmin, tmax, out[1])


def _bwd(res, cts):
    """With the hit prim frozen, (t, b1, b2) are the closed-form
    Moller-Trumbore outputs — differentiate those directly."""
    tris9, o, d, tmin, tmax, prim = res

    def ref_diff(tris9, o, d, tmin, tmax):
        from .intersect import moller_trumbore
        pid = jnp.maximum(prim, 0)
        tri = tris9[pid]
        _, t, b1, b2 = moller_trumbore(
            o, d, tri[:, 0:3], tri[:, 3:6], tri[:, 6:9], tmin, tmax)
        ok = prim >= 0
        return (jnp.where(ok, t, tmax), jnp.where(ok, b1, 0.0),
                jnp.where(ok, b2, 0.0))

    _, vjp = jax.vjp(ref_diff, tris9, o, d, tmin, tmax)
    ct_t, _, ct_b1, ct_b2 = cts
    g_tris9, g_o, g_d, g_tmin, g_tmax = vjp((ct_t, ct_b1, ct_b2))
    # the packed tables are pure acceleration data: symbolic-zero cotangents
    return (None, None, g_tris9, g_o, g_d, g_tmin, g_tmax)


bvh_intersect_packet.defvjp(_fwd, _bwd)
