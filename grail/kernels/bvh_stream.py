"""Pallas TPU BVH traversal — ordered sub-packet streaming.

pbrt traverses per ray with a per-thread todo[64] stack and near-child-first
ordering (bvh.cpp BVHAccel::Intersect ~L520). TPUs have no per-lane gather and
Mosaic loop iterations cost ~300 ns, so the design here amortizes differently
(measured on TPU v5e; see benchmarks/micro.py):

* Rays are processed as 8 independent **sub-packets of 128 rays**, one per
  sublane of the native (8,128) f32 tile. Each sub-packet streams one record
  per step; the slab-test / Möller-Trumbore payload runs on the full (8,128)
  tile, so the VPU stays busy even though the 8 record streams diverge.
  128-ray packets keep the per-packet node/tri *union* small (a 1024-wide
  packet visits the union of everything any of its rays needs).
* The tree is re-laid-out host-side as a **record stream** in DFS preorder:
  interior nodes are box records; leaves emit only their triangle records
  (in this kernel a box step costs the same as a triangle step, so for small
  leaf runs the parent box is the only guard worth paying for). The left
  child always starts at ``id + 1``; the right child's start rides in the
  record, so traversal needs only a tiny per-packet stack of right-child ids
  in SMEM — and can visit the near child first per packet direction sign,
  exactly pbrt's dirIsNeg ordering (measured 2x fewer steps than any fixed
  traversal order).
* Records are 10 f32 fields (12 per 128-lane row, 40 B/record): one dynamic
  row load per sub-packet per step fetches a record; fields are extracted
  with axis-1 iota-mask reductions. Box and tri records share the layout and
  the payload computes both interpretations, selecting by a tag bit packed
  into the meta field — no data-dependent control flow in the inner loop.
* The loop body is manually unrolled (UNROLL steps per while iteration) to
  amortize the fixed Mosaic loop overhead.

Record layout (10 f32 fields, 12 per row):
  box: f0..2 bmin, f3..5 bmax, f9 = right_child_rec * 8 + split_axis
  tri: f0..8 v0|e1|e2,          f9 = prim_id * 8 + 4 + (run continues)
(meta values stay < 2^24 so they are exact in f32 up to 2M records.)

The record table must fit VMEM (~12.5 MB -> ~320k records ≈ 250k tris at
force_leaf=4); larger scenes fall back to the jnp traversal / use the
two-level scene partition (TLAS over VMEM-sized clusters; planned).

Differentiable via custom_vjp: backward freezes the hit prim and re-derives
(t, b1, b2) from the closed-form Möller-Trumbore on the traced (T,9) tri
table (recompute-in-backward, SURVEY §7.3); the baked record table carries no
gradients (pure acceleration data — like any BVH it must be re-built/refit if
vertices move between optimization steps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8                  # sub-packets per block (one per sublane)
LANES = 128               # rays per sub-packet
BLOCK = ROWS * LANES      # rays per grid step
FIELDS = 16               # 10 used + pad to a power of two (shift addressing)
RECS_PER_ROW = 8
import os as _os0
UNROLL = int(_os0.environ.get("GRAIL_STREAM_UNROLL", "4"))
STACK = 96                # per-sub-packet right-child stack (SMEM), slot 0 unused
BIG_T = jnp.float32(3.0e37)

# VMEM budget for the resident record table (bytes)
VMEM_TABLE_BUDGET = 12 * 1024 * 1024 + 512 * 1024


# --------------------------------------------------------------------------
# host-side packer: flattened binary BVH -> preorder record stream
# --------------------------------------------------------------------------

def _concat_arange(counts):
    """[a,b,c] -> [0..a-1, 0..b-1, 0..c-1]."""
    total = int(counts.sum())
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(total, dtype=np.int64) - starts


def build_stream_records(bvh, tris9_ordered, prim_map=None):
    """Record stream from a flattened binary BVH (scene/bvh.py layout).

    bvh: numpy dict {bounds_min/max (Nn,3), right, prim_off, nprims, axis,
    prim_ids}. tris9_ordered: (T,9) [v0|e1|e2] already re-ordered by
    bvh["prim_ids"] (leaf order). prim_map: optional local→global prim id
    remap (clustered tables emit GLOBAL ids so the hit record and backward
    recompute index the global triangle array). Returns (R,11) float32
    records, R = #interior + T (leaf nodes emit no box record).

    Field 10 is the SKIP LINK: the record id of the first record after this
    record's subtree (-1 past the end) — the preorder "miss" successor. The
    ordered stack kernel ignores it; the stackless kernel follows it on a box
    miss / last-tri advance, so traversal needs no per-stream stack at all
    (pbrt's bvh.cpp uses a todo[] stack; the skip link is the classic
    threaded-tree alternative with identical visit semantics, minus the
    near-child-first ordering).
    """
    right = np.asarray(bvh["right"], np.int64)
    nprims = np.asarray(bvh["nprims"], np.int64)
    prim_off = np.asarray(bvh["prim_off"], np.int64)
    prim_ids = np.asarray(bvh["prim_ids"], np.int64)
    axis = np.asarray(bvh["axis"], np.int64)
    n = right.shape[0]
    T = prim_ids.shape[0]
    leaf = nprims > 0

    # record id of node i = (#interior before i) + (#tris before i)
    interior = (~leaf).astype(np.int64)
    start = (np.cumsum(interior) - interior) + (np.cumsum(nprims) - nprims)
    total = int(interior.sum()) + T

    # per-node skip record: DFS with the "next after my subtree" carried down
    # (left child's skip = right child's start; right child's = parent's)
    skip = np.full(n, -1, np.int64)
    stack = [(0, -1)]
    while stack:
        i, s = stack.pop()
        skip[i] = s
        if not leaf[i]:
            r = right[i]
            stack.append((int(r), s))
            stack.append((i + 1, int(start[r])))

    recs = np.zeros((total, 11), np.float32)
    # box records (interior only): meta = right_child_record*8 + axis
    ii = np.where(~leaf)[0]
    recs[start[ii], 0:3] = np.asarray(bvh["bounds_min"], np.float32)[ii]
    recs[start[ii], 3:6] = np.asarray(bvh["bounds_max"], np.float32)[ii]
    recs[start[ii], 9] = (start[right[ii]] * 8 + axis[ii]).astype(np.float32)
    recs[start[ii], 10] = skip[ii].astype(np.float32)
    # tri records (per leaf: positions start..start+n-1, sources prim_off+k)
    li = np.where(leaf)[0]
    cnt = nprims[li]
    k = _concat_arange(cnt)
    pos = np.repeat(start[li], cnt) + k
    src = np.repeat(prim_off[li], cnt) + k
    more = (k < np.repeat(cnt - 1, cnt)).astype(np.int64)
    recs[pos, 0:9] = np.asarray(tris9_ordered, np.float32)[src]
    emit_ids = prim_ids[src]
    if prim_map is not None:
        emit_ids = np.asarray(prim_map, np.int64)[emit_ids]
    recs[pos, 9] = (emit_ids * 8 + 4 + more).astype(np.float32)
    recs[pos, 10] = np.repeat(skip[li], cnt).astype(np.float32)
    return recs


def pack_record_rows(recs):
    """(R,11) -> (ceil(R/8), 128) row-packed table (records padded to 16)."""
    R = recs.shape[0]
    pad = -R % RECS_PER_ROW
    if pad:
        recs = np.pad(np.asarray(recs), ((0, pad), (0, 0)))
    nf = recs.shape[1]
    recs = np.pad(np.asarray(recs, np.float32), ((0, 0), (0, FIELDS - nf)))
    return recs.reshape(-1, RECS_PER_ROW * FIELDS)


def build_stream_table(bvh_np, verts_np, tri_idx_np):
    """Full pipeline: numpy BVH + geometry -> packed device-ready table."""
    verts = np.asarray(verts_np, np.float32)
    idx = np.asarray(tri_idx_np, np.int64)
    v0 = verts[idx[:, 0]]
    tris9 = np.concatenate(
        [v0, verts[idx[:, 1]] - v0, verts[idx[:, 2]] - v0], axis=1)
    ordered = tris9[np.asarray(bvh_np["prim_ids"], np.int64)]
    return pack_record_rows(build_stream_records(bvh_np, ordered))


def stream_fits_vmem(scene) -> bool:
    bvh = scene.get("bvh")
    if bvh is None or "stream" not in bvh:
        return False
    return bvh["stream"].size * 4 < VMEM_TABLE_BUDGET


# --------------------------------------------------------------------------
# clustered tables: scenes beyond the VMEM wall (SURVEY §5.7, BASELINE cfg 4)
# --------------------------------------------------------------------------

CLUSTER_TARGET_TRIS = 140_000   # ~80 B/tri of records keeps each table <12 MB


def _morton_np(c, bits=10):
    q = np.clip(c * (1 << bits), 0, (1 << bits) - 1).astype(np.uint64)

    def spread(v):
        out = np.zeros_like(v)
        for i in range(bits):
            out |= ((v >> i) & 1) << (3 * i)
        return out
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def build_clustered_stream(verts_np, tri_idx_np, build_bvh,
                           target=CLUSTER_TARGET_TRIS):
    """Scenes whose record stream exceeds VMEM: Morton-order triangles by
    centroid, cut into spatially compact clusters of <= `target` tris, build
    one stream table per cluster (records carry GLOBAL prim ids), pad to a
    common row count, and stack to (C, rows, 128). Traversal runs one
    pallas launch per cluster with min-t merge + cross-cluster tmax
    tightening (kernels/intersect.py); each launch's table still fits VMEM,
    so 1M+ triangle scenes traverse at stream speed. The two-level analog of
    pbrt's single big BVH (src/accelerators/bvh.cpp), shaped by the VMEM
    budget instead of cache lines."""
    verts = np.asarray(verts_np, np.float32)
    idx = np.asarray(tri_idx_np, np.int64)
    T = idx.shape[0]
    v0 = verts[idx[:, 0]]
    cen = (v0 + verts[idx[:, 1]] + verts[idx[:, 2]]) / 3.0
    lo, hi = cen.min(0), cen.max(0)
    order = np.argsort(_morton_np((cen - lo) / np.maximum(hi - lo, 1e-9)),
                       kind="stable")
    C = -(-T // target)
    per = -(-T // C)
    tables = []
    for c in range(C):
        members = np.sort(order[c * per:(c + 1) * per])
        sub_idx = idx[members]
        b = build_bvh(verts, sub_idx, max_prims=4, force_leaf=4)
        sv0 = verts[sub_idx[:, 0]]
        tris9 = np.concatenate(
            [sv0, verts[sub_idx[:, 1]] - sv0, verts[sub_idx[:, 2]] - sv0],
            axis=1)
        ordered = tris9[np.asarray(b["prim_ids"], np.int64)]
        recs = build_stream_records(b, ordered, prim_map=members)
        tables.append(pack_record_rows(recs))
    rows = max(t.shape[0] for t in tables)
    # pad rows are unreachable (traversal starts at record 0 and only visits
    # what the root's subtree references)
    tables = [np.pad(t, ((0, rows - t.shape[0]), (0, 0))) for t in tables]
    return np.stack(tables)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

# record-field extraction strategy (GRAIL_STREAM_EXTRACT):
#   masked — per-field iota-mask cross-lane reductions (10-11 per step)
#   roll   — one dynamic lane-rotate per stream brings the record's fields to
#            lanes 0..nf-1, then each field is a static one-lane slice
#            (attacks the ~250 ns/step extraction cost in the round-4
#            step-time decomposition)
import os as _os
_EXTRACT = _os.environ.get("GRAIL_STREAM_EXTRACT", "masked")


def _load_fields(tab_ref, ids, idv, nf, lane_grp, fmask):
    """Fetch each stream's current record row and broadcast fields 0..nf-1
    to (ROWS, 1) columns."""
    if _EXTRACT == "roll":
        rows = []
        for s in range(ROWS):
            rid = jnp.maximum(ids[s], 0)
            row = tab_ref[rid >> 3, :][None, :]
            shift = (LANES - (rid & 7) * FIELDS) % LANES
            rows.append(pltpu.roll(row, shift, axis=1))
        tile = jnp.concatenate(rows, axis=0)
        return [tile[:, f:f + 1] for f in range(nf)]
    rows = [tab_ref[jnp.maximum(ids[s], 0) >> 3, :][None, :]
            for s in range(ROWS)]
    tile = jnp.concatenate(rows, axis=0)                # (8,128)
    gmask = lane_grp == (jnp.maximum(idv, 0) & 7)       # record slot mask
    return [jnp.sum(jnp.where(gmask & fmask[f], tile, 0.0),
                    axis=1, keepdims=True) for f in range(nf)]


def _make_kernel(any_hit):
    def _kernel(starts_ref, tab_ref, ox, oy, oz, dx, dy, dz, tmin_ref,
                tmax_ref, t_out, prim_out, b1_out, b2_out, stack_ref):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmin_ref[:]
        inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-20,
                                    jnp.where(c < 0, -1e-20, 1e-20), c)
                    for c in d)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        lane_grp = lanes >> 4                       # record slot of each lane
        fmask = [(lanes & 15) == f for f in range(10)]  # per-field lane masks
        # per-sub-packet majority direction sign -> near-child selector
        # (packet analog of pbrt's dirIsNeg[axis]); int32 0/1 because Mosaic
        # cannot select between i1 vectors
        neg = [(jnp.sum((c < 0).astype(jnp.int32), axis=1, keepdims=True)
                > (LANES // 2)).astype(jnp.int32) for c in d]    # (8,1) each

        def step(c):
            (ids, sps, t_best, prim_best, b1_best, b2_best) = c
            idv = jnp.concatenate(
                [jnp.full((1, 1), i, jnp.int32) for i in ids], axis=0)
            v = _load_fields(tab_ref, ids, idv, 10, lane_grp, fmask)

            # ---- box view: slab test (bvh.cpp bounds test)
            tx0 = (v[0] - o[0]) * inv[0]
            tx1 = (v[3] - o[0]) * inv[0]
            ty0 = (v[1] - o[1]) * inv[1]
            ty1 = (v[4] - o[1]) * inv[1]
            tz0 = (v[2] - o[2]) * inv[2]
            tz1 = (v[5] - o[2]) * inv[2]
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1)) * 1.0000004
            box_hit = (near <= far) & (far > tmin) & (near < t_best)

            # ---- tri view: Möller-Trumbore (trianglemesh.cpp ~L150)
            s1x = d[1] * v[8] - d[2] * v[7]
            s1y = d[2] * v[6] - d[0] * v[8]
            s1z = d[0] * v[7] - d[1] * v[6]
            divisor = s1x * v[3] + s1y * v[4] + s1z * v[5]
            dinv = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
            sx = o[0] - v[0]
            sy = o[1] - v[1]
            sz = o[2] - v[2]
            b1 = (sx * s1x + sy * s1y + sz * s1z) * dinv
            s2x = sy * v[5] - sz * v[4]
            s2y = sz * v[3] - sx * v[5]
            s2z = sx * v[4] - sy * v[3]
            b2 = (d[0] * s2x + d[1] * s2y + d[2] * s2z) * dinv
            t = (v[6] * s2x + v[7] * s2y + v[8] * s2z) * dinv
            tri_hit = ((divisor != 0.0)
                       & (b1 >= 0.0) & (b1 <= 1.0)
                       & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                       & (t > tmin) & (t < t_best))

            # ---- meta decode: box m = right*8+axis, tri m = prim*8+4+more
            m = v[9].astype(jnp.int32)                      # (8,1)
            is_tri = (m & 4) > 0
            active = idv >= 0
            upd = tri_hit & is_tri & active
            t_best = jnp.where(upd, t, t_best)
            prim_best = jnp.where(upd, m >> 3, prim_best)
            b1_best = jnp.where(upd, b1, b1_best)
            b2_best = jnp.where(upd, b2, b2_best)
            if any_hit:
                # kill rays that already have a hit: they stop driving
                # box tests and cannot re-hit (near/t < -3e37 fails)
                t_best = jnp.where(upd, -3.0e37, t_best)

            any_box = jnp.any(box_hit & active & ~is_tri,
                              axis=1, keepdims=True)        # (8,1)
            ax = m & 3
            near_right = jnp.where(ax == 0, neg[0],
                                   jnp.where(ax == 1, neg[1], neg[2]))
            # codes: 0=pop, 1=advance(id+1), 2=goto id+1 push right,
            #        3=goto right push id+1;  enc = operand*4 + code.
            # Inactive packets encode pop: with an empty stack that keeps
            # them parked at -1.
            right = m >> 3
            code = jnp.where(is_tri,
                             m & 1,
                             jnp.where(any_box, 2 + near_right, 0))
            enc = jnp.where(active, right * 4 + code, 0)    # (8,1)

            new_ids = []
            new_sps = []
            for s in range(ROWS):
                e = enc[s, 0]
                cs = ids[s]
                sp = sps[s]
                cd = e & 3
                opr = e >> 2
                adv = cs + 1
                # push slot (harmless overwrite at sp when not pushing)
                stack_ref[s * STACK + sp] = jnp.where(cd == 2, opr, adv)
                popped = stack_ref[s * STACK + sp - 1]
                nxt = jnp.where(
                    cd == 0,
                    jnp.where(sp > 1, popped, -1),
                    jnp.where(cd == 3, opr, adv))
                new_sps.append(jnp.where(cd == 0, jnp.maximum(sp - 1, 1),
                                         sp + (cd >> 1)))
                new_ids.append(nxt)
            return (tuple(new_ids), tuple(new_sps),
                    t_best, prim_best, b1_best, b2_best)

        def cond(c):
            ids = c[0]
            alive = ids[0] >= 0
            for s in range(1, ROWS):
                alive = alive | (ids[s] >= 0)
            return alive

        def body(c):
            for _ in range(UNROLL):
                c = step(c)
            return c

        shape = tmax_ref.shape
        init = (
            tuple(starts_ref[pl.program_id(0) * ROWS + s]
                  for s in range(ROWS)),
            (jnp.int32(1),) * ROWS,
            tmax_ref[:],
            jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        c = jax.lax.while_loop(cond, body, init)
        _, _, t_best, prim_best, b1_best, b2_best = c
        t_out[:] = t_best
        prim_out[:] = prim_best
        b1_out[:] = b1_best
        b2_out[:] = b2_best

    return _kernel


_KERNELS = {False: _make_kernel(False), True: _make_kernel(True)}


def _make_skip_kernel(any_hit):
    """Stackless skip-link traversal (record field 10 = preorder miss
    successor): next id is `id+1` on a box hit / tri-run continue and
    `skip` otherwise, so each stream carries ONLY its current record id — no
    SMEM stack chain (measured ~200 ns of the ~790 ns ordered-kernel step).
    Fixed preorder visit order (no near-child-first): for ANY-HIT occlusion
    order is irrelevant, and the kernel adds per-stream early exit the
    ordered kernel lacks — a stream parks as soon as every one of its 128
    rays has found an occluder. For closest-hit the lost front-to-back
    pruning costs extra steps; kept selectable for measurement."""
    def _kernel(starts_ref, tab_ref, ox, oy, oz, dx, dy, dz, tmin_ref,
                tmax_ref, t_out, prim_out, b1_out, b2_out):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmin_ref[:]
        inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-20,
                                    jnp.where(c < 0, -1e-20, 1e-20), c)
                    for c in d)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        lane_grp = lanes >> 4
        fmask = [(lanes & 15) == f for f in range(11)]

        def step(c):
            (ids, t_best, prim_best, b1_best, b2_best) = c
            idv = jnp.concatenate(
                [jnp.full((1, 1), i, jnp.int32) for i in ids], axis=0)
            v = _load_fields(tab_ref, ids, idv, 11, lane_grp, fmask)

            # ---- box view: slab test
            tx0 = (v[0] - o[0]) * inv[0]
            tx1 = (v[3] - o[0]) * inv[0]
            ty0 = (v[1] - o[1]) * inv[1]
            ty1 = (v[4] - o[1]) * inv[1]
            tz0 = (v[2] - o[2]) * inv[2]
            tz1 = (v[5] - o[2]) * inv[2]
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1)) * 1.0000004
            box_hit = (near <= far) & (far > tmin) & (near < t_best)

            # ---- tri view: Möller-Trumbore
            s1x = d[1] * v[8] - d[2] * v[7]
            s1y = d[2] * v[6] - d[0] * v[8]
            s1z = d[0] * v[7] - d[1] * v[6]
            divisor = s1x * v[3] + s1y * v[4] + s1z * v[5]
            dinv = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
            sx = o[0] - v[0]
            sy = o[1] - v[1]
            sz = o[2] - v[2]
            b1 = (sx * s1x + sy * s1y + sz * s1z) * dinv
            s2x = sy * v[5] - sz * v[4]
            s2y = sz * v[3] - sx * v[5]
            s2z = sx * v[4] - sy * v[3]
            b2 = (d[0] * s2x + d[1] * s2y + d[2] * s2z) * dinv
            t = (v[6] * s2x + v[7] * s2y + v[8] * s2z) * dinv
            tri_hit = ((divisor != 0.0)
                       & (b1 >= 0.0) & (b1 <= 1.0)
                       & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                       & (t > tmin) & (t < t_best))

            m = v[9].astype(jnp.int32)                      # (8,1)
            skipv = v[10].astype(jnp.int32)                 # (8,1)
            is_tri = (m & 4) > 0
            active = idv >= 0
            upd = tri_hit & is_tri & active
            t_best = jnp.where(upd, t, t_best)
            prim_best = jnp.where(upd, m >> 3, prim_best)
            b1_best = jnp.where(upd, b1, b1_best)
            b2_best = jnp.where(upd, b2, b2_best)
            if any_hit:
                t_best = jnp.where(upd, -3.0e37, t_best)

            # int32 0/1 selects — Mosaic cannot select between i1 vectors
            any_box = (jnp.sum((box_hit & active & ~is_tri).astype(jnp.int32),
                               axis=1, keepdims=True) > 0).astype(jnp.int32)
            descend = jnp.where(is_tri, m & 1, any_box)     # (8,1) int32
            nxt = jnp.where(descend > 0, idv + 1, skipv)
            if any_hit:
                # park the stream once every ray found an occluder
                row_live = jnp.sum((t_best > -1.0e37).astype(jnp.int32),
                                   axis=1, keepdims=True)
                nxt = jnp.where(row_live > 0, nxt, -1)
            nxt = jnp.where(active, nxt, -1)
            new_ids = tuple(nxt[s, 0] for s in range(ROWS))
            return (new_ids, t_best, prim_best, b1_best, b2_best)

        def cond(c):
            ids = c[0]
            alive = ids[0] >= 0
            for s in range(1, ROWS):
                alive = alive | (ids[s] >= 0)
            return alive

        def body(c):
            for _ in range(UNROLL):
                c = step(c)
            return c

        shape = tmax_ref.shape
        init = (
            tuple(starts_ref[pl.program_id(0) * ROWS + s]
                  for s in range(ROWS)),
            tmax_ref[:],
            jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        c = jax.lax.while_loop(cond, body, init)
        _, t_best, prim_best, b1_best, b2_best = c
        t_out[:] = t_best
        prim_out[:] = prim_best
        b1_out[:] = b1_best
        b2_out[:] = b2_best

    return _kernel


_SKIP_KERNELS = {False: _make_skip_kernel(False), True: _make_skip_kernel(True)}


# kernel selection per traversal kind: "ordered" (near-child-first via the
# SMEM right-child stack) or "skip" (stackless skip links). Any-hit defaults
# to skip (order-independent + per-stream early exit); closest-hit to ordered
# (front-to-back pruning wins; round-5 measurement in ROUND5_NOTES.md).
CLOSEST_KERNEL = "ordered"
ANYHIT_KERNEL = "skip"


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret", "kind"))
def _run(table, o, d, tmin, tmax, any_hit=False, interpret=None, kind=None,
         starts=None):
    """starts: optional (ceil(n/128),) int32 — per-128-ray-stream start
    record id (instanced BLAS traversal roots); default all streams start at
    record 0 (the whole-scene root). interpret=None reads
    GRAIL_PALLAS_INTERPRET (CPU testing of callers that can't thread the
    flag, e.g. through the custom_vjp wrappers)."""
    if interpret is None:
        interpret = bool(_os.environ.get("GRAIL_PALLAS_INTERPRET"))
    n = o.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    rows = n_pad // LANES

    def field(x, fill):
        return jnp.pad(x, (0, n_pad - n),
                       constant_values=fill).reshape(rows, LANES)

    if starts is None:
        starts_r = jnp.zeros((rows,), jnp.int32)
    else:
        starts_r = jnp.pad(starts.astype(jnp.int32),
                           (0, rows - starts.shape[0]), constant_values=-1)
    # padded lanes: tmin=+BIG, tmax=-BIG → no box/tri test can pass
    fields = [field(o[:, 0], 0.0), field(o[:, 1], 0.0), field(o[:, 2], 0.0),
              field(d[:, 0], 1.0), field(d[:, 1], 0.0), field(d[:, 2], 0.0),
              field(tmin, BIG_T), field(tmax, -BIG_T)]
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    if kind is None:
        kind = ANYHIT_KERNEL if any_hit else CLOSEST_KERNEL
    if kind == "skip":
        kernel, scratch = _SKIP_KERNELS[any_hit], []
    else:
        kernel = _KERNELS[any_hit]
        scratch = [pltpu.SMEM((ROWS * STACK,), jnp.int32)]
    t, prim, b1, b2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // ROWS,),
            in_specs=[table_spec] + [ray_spec] * 8,
            out_specs=[ray_spec] * 4,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(starts_r, table, *fields)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(prim), flat(b1), flat(b2)


# --------------------------------------------------------------------------
# differentiable entry points
# --------------------------------------------------------------------------

def _make_intersect(kind):
    """Differentiable closest-hit entry point bound to a traversal kind
    (None → CLOSEST_KERNEL default)."""
    @jax.custom_vjp
    def f(table, tris9, o, d, tmin, tmax, starts=None):
        return _run(table, o, d, tmin, tmax, any_hit=False, starts=starts,
                    kind=kind)

    def _fwd(table, tris9, o, d, tmin, tmax, starts=None):
        out = _run(table, o, d, tmin, tmax, any_hit=False, starts=starts,
                   kind=kind)
        return out, (tris9, o, d, tmin, tmax, out[1])

    def _bwd(res, cts):
        """With the hit prim frozen, (t, b1, b2) are the closed-form
        Möller-Trumbore outputs — differentiate those directly."""
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
        return (None, g_tris9, g_o, g_d, g_tmin, g_tmax, None)

    f.defvjp(_fwd, _bwd)
    return f


"""Closest hit via sub-packet streaming. Returns (t,prim,b1,b2).

tris9 (T,9) [v0|e1|e2] is the unordered traced triangle table used only
by the backward recompute. starts: optional per-stream root record ids
(instanced BLAS traversal; int32, zero-cotangent in the vjp).

Kernel choice per coherence regime (benchmarks/streamvariants_r05.json,
TPU v5e, 100k terrain): tile-ordered CAMERA waves take the stackless skip
kernel — their per-packet unions are small, so deleting the stack chain
beats near-child-first ordering 7.3 vs 3.2 Mrays/s — while sorted
secondary/incoherent waves keep the ordered kernel, whose front-to-back
pruning wins once unions grow (1.21 vs 0.99 Mrays/s)."""
bvh_stream_intersect = _make_intersect(None)
bvh_stream_intersect_coherent = _make_intersect("skip")


def bvh_stream_intersect_p(table, o, d, tmin, tmax, starts=None):
    """Any-hit (occlusion) variant with per-ray early-kill. Returns occluded."""
    _, prim, _, _ = _run(table, o, d, tmin, tmax, any_hit=True, starts=starts)
    return prim >= 0
