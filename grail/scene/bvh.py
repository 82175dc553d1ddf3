"""BVH construction — pbrt src/accelerators/bvh.cpp re-architected for TPU.

The reference builds a binary SAH tree (12 buckets, traversal cost 0.125, leaf cap
`maxPrimsInNode`) then flattens depth-first into 32-byte LinearBVHNodes. Here the
host builds the same binary SAH topology (NumPy; a C++ builder drops in for >100k
tris — see grail/native/), but flattens into SoA arrays shaped for a vectorized
traversal kernel:

  bounds_min/max (Nn,3) f32 | right (Nn,) i32 second-child index (-1 ⇒ leaf)
  prim_off (Nn,) i32 | nprims (Nn,) i32 | axis (Nn,) i32 | prim_ids (T,) i32

First child is node i+1 (DFS order, as LinearBVHNode). Traversal visits the near
child first using `axis` + ray sign exactly like BVHAccel::Intersect.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

MAX_PRIMS_IN_NODE = 4
N_BUCKETS = 12
TRAV_COST = 0.125


def _surface_area(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def build_bvh(verts, tris, max_prims=MAX_PRIMS_IN_NODE, force_leaf=0):
    """SAH BVH over triangles. verts (V,3), tris (T,3) numpy. Returns dict of np
    arrays (flattened tree, see module docstring).

    force_leaf: make a leaf whenever n <= force_leaf regardless of SAH. The
    streaming traversal kernel (kernels/bvh_stream.py) pays the same for a box
    step as for a triangle step, so splitting below ~4 prims never pays there —
    unlike pbrt's single-ray cost model (trav 0.125) which splits to 1."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64)
    T = tris.shape[0]
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    prim_min = np.minimum(np.minimum(p0, p1), p2)
    prim_max = np.maximum(np.maximum(p0, p1), p2)
    centroid = 0.5 * (prim_min + prim_max)

    order = np.arange(T)
    # output accumulators (lists → arrays)
    nodes_min, nodes_max, nodes_right, nodes_off, nodes_n, nodes_axis = \
        [], [], [], [], [], []
    ordered = []

    import sys
    sys.setrecursionlimit(100000)

    def emit():
        i = len(nodes_min)
        nodes_min.append(None)
        nodes_max.append(None)
        nodes_right.append(-1)
        nodes_off.append(0)
        nodes_n.append(0)
        nodes_axis.append(0)
        return i

    def build(ids):
        ni = emit()
        mn = prim_min[ids].min(0)
        mx = prim_max[ids].max(0)
        nodes_min[ni] = mn
        nodes_max[ni] = mx
        n = len(ids)
        if n <= max(1, force_leaf):
            nodes_off[ni] = len(ordered)
            nodes_n[ni] = n
            ordered.extend(ids.tolist())
            return ni
        c = centroid[ids]
        cmn, cmx = c.min(0), c.max(0)
        axis = int(np.argmax(cmx - cmn))
        nodes_axis[ni] = axis
        if cmx[axis] - cmn[axis] < 1e-12:
            # degenerate: all centroids coincide → leaf (bvh.cpp same-point case)
            nodes_off[ni] = len(ordered)
            nodes_n[ni] = n
            ordered.extend(ids.tolist())
            return ni
        if n <= 2:
            mid = n // 2
            part = np.argsort(c[:, axis], kind="stable")
            left_ids, right_ids = ids[part[:mid]], ids[part[mid:]]
        else:
            # binned SAH (bvh.cpp recursiveBuild SAH branch)
            b = np.minimum((N_BUCKETS * (c[:, axis] - cmn[axis])
                            / (cmx[axis] - cmn[axis])).astype(np.int64),
                           N_BUCKETS - 1)
            cnt = np.bincount(b, minlength=N_BUCKETS)
            bmn = np.full((N_BUCKETS, 3), np.inf, np.float32)
            bmx = np.full((N_BUCKETS, 3), -np.inf, np.float32)
            np.minimum.at(bmn, b, prim_min[ids])
            np.maximum.at(bmx, b, prim_max[ids])
            # prefix/suffix areas
            lmn = np.minimum.accumulate(bmn, 0)
            lmx = np.maximum.accumulate(bmx, 0)
            rmn = np.minimum.accumulate(bmn[::-1], 0)[::-1]
            rmx = np.maximum.accumulate(bmx[::-1], 0)[::-1]
            lcnt = np.cumsum(cnt)
            rcnt = np.cumsum(cnt[::-1])[::-1]
            total_sa = max(_surface_area(mn, mx), 1e-20)
            costs = np.full(N_BUCKETS - 1, np.inf)
            for i in range(N_BUCKETS - 1):
                if lcnt[i] == 0 or rcnt[i + 1] == 0:
                    continue
                costs[i] = TRAV_COST + (
                    lcnt[i] * _surface_area(lmn[i], lmx[i])
                    + rcnt[i + 1] * _surface_area(rmn[i + 1], rmx[i + 1])
                ) / total_sa
            best = int(np.argmin(costs))
            leaf_cost = float(n)
            if n <= max_prims and leaf_cost <= costs[best]:
                nodes_off[ni] = len(ordered)
                nodes_n[ni] = n
                ordered.extend(ids.tolist())
                return ni
            go_left = b <= best
            left_ids, right_ids = ids[go_left], ids[~go_left]
            if len(left_ids) == 0 or len(right_ids) == 0:
                part = np.argsort(c[:, axis], kind="stable")
                mid = n // 2
                left_ids, right_ids = ids[part[:mid]], ids[part[mid:]]
        build(left_ids)
        nodes_right[ni] = build(right_ids)
        return ni

    build(order)
    return {
        "bounds_min": np.stack(nodes_min).astype(np.float32),
        "bounds_max": np.stack(nodes_max).astype(np.float32),
        "right": np.asarray(nodes_right, np.int32),
        "prim_off": np.asarray(nodes_off, np.int32),
        "nprims": np.asarray(nodes_n, np.int32),
        "axis": np.asarray(nodes_axis, np.int32),
        "prim_ids": np.asarray(ordered, np.int32),
        "max_prims": np.int32(max_prims),
    }


NATIVE_THRESHOLD = 2048     # tris above which the C++ builder is worth loading


def build_bvh_auto(verts, tris, max_prims=MAX_PRIMS_IN_NODE, force_leaf=0):
    """Builder dispatch: C++ (grail/native) for large meshes, NumPy otherwise.

    GRAIL_NATIVE_BVH=1 forces native, =0 forces NumPy. Both emit the same
    flattened layout; the fuzz suite checks hit-for-hit agreement."""
    import os
    pref = os.environ.get("GRAIL_NATIVE_BVH", "")
    T = np.asarray(tris).shape[0]
    want_native = pref == "1" or (pref != "0" and T >= NATIVE_THRESHOLD)
    if want_native:
        from ..native import build_bvh_native
        b = build_bvh_native(verts, tris, max_prims, force_leaf)
        if b is not None:
            return b
    return build_bvh(verts, tris, max_prims, force_leaf)


def bvh_to_device(b):
    return {k: jnp.asarray(v) for k, v in b.items()}


def validate_bvh(b, verts, tris):
    """Structural invariants (used by the fuzz harness)."""
    n = len(b["right"])
    assert b["prim_ids"].shape[0] == tris.shape[0]
    assert sorted(b["prim_ids"].tolist()) == list(range(tris.shape[0]))
    for i in range(n):
        if b["nprims"][i] == 0:
            r = b["right"][i]
            assert 0 <= i + 1 < n and 0 <= r < n
            for ch in (i + 1, r):
                assert np.all(b["bounds_min"][ch] >= b["bounds_min"][i] - 1e-4)
                assert np.all(b["bounds_max"][ch] <= b["bounds_max"][i] + 1e-4)
    return True
