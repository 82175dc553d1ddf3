"""BVH traversal kernels — the vectorized analog of BVHAccel::Intersect/IntersectP
(pbrt src/accelerators/bvh.cpp ~L520): precomputed invDir + dir signs, explicit
per-ray traversal stack, near-child-first ordering via split axis, slab tests
against node bounds, Möller-Trumbore at leaves updating ray tmax.

This module holds the pure-jnp `lax.while_loop` implementation (runs everywhere,
reference for correctness); kernels/bvh_stream.py holds the Pallas TPU kernel that
the dispatch prefers on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.vecmath import dot, cross
from .intersect import moller_trumbore, BIG_T

STACK_DEPTH = 64
MAX_LEAF_PRIMS = 4


def _slab(o, inv_d, tmin, tmax, bmin, bmax):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.0000004
    return (near <= far) & (far > tmin) & (near < tmax)


def traverse_tables(bvh, verts, tri_idx, o, d, tmax, tmin, any_hit,
                    root=None):
    """Shared traversal loop over explicit flattened-BVH tables.

    any_hit=True → early-out occlusion (IntersectP). root: optional per-lane
    (N,) start node — the BLAS entry point for two-level TLAS traversal
    (pbrt TransformedPrimitive::Intersect hands the object-space ray to the
    inner aggregate; here the inner aggregates live concatenated in one node
    table and each lane starts at its instance's subtree root)."""
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    neg = (inv_d < 0.0)  # (N,3)

    prim_ids = bvh["prim_ids"]

    stack0 = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    if root is not None:
        stack0 = stack0.at[:, 0].set(root)
    state = {
        "stack": stack0,
        "sp": jnp.ones((n,), jnp.int32),        # stack holds the root
        "t": tmax,
        "prim": jnp.full((n,), -1, jnp.int32),
        "b1": jnp.zeros((n,), jnp.float32),
        "b2": jnp.zeros((n,), jnp.float32),
        "done": tmax <= tmin,
    }

    def cond(s):
        return jnp.any(~s["done"] & (s["sp"] > 0))

    def body(s):
        alive = ~s["done"] & (s["sp"] > 0)
        sp = jnp.maximum(s["sp"] - 1, 0)
        node = jnp.take_along_axis(s["stack"], sp[:, None], axis=1)[:, 0]
        node = jnp.where(alive, node, 0)

        bmin = bvh["bounds_min"][node]
        bmax = bvh["bounds_max"][node]
        hit_box = _slab(o, inv_d, tmin, s["t"], bmin, bmax) & alive

        nprims = bvh["nprims"][node]
        is_leaf = nprims > 0
        axis = bvh["axis"][node]
        right = bvh["right"][node]

        # --- leaf: test up to MAX_LEAF_PRIMS triangles
        t_best = s["t"]
        prim_best = s["prim"]
        b1_best = s["b1"]
        b2_best = s["b2"]
        leaf_active = hit_box & is_leaf
        off = bvh["prim_off"][node]
        for k in range(MAX_LEAF_PRIMS):
            valid_k = leaf_active & (k < nprims)
            pid = prim_ids[jnp.where(valid_k, off + k, 0)]
            tvi = tri_idx[pid]
            v0 = verts[tvi[:, 0]]
            e1 = verts[tvi[:, 1]] - v0
            e2 = verts[tvi[:, 2]] - v0
            h, t, b1, b2 = moller_trumbore(o, d, v0, e1, e2, tmin, t_best)
            h = h & valid_k
            t_best = jnp.where(h, t, t_best)
            prim_best = jnp.where(h, pid, prim_best)
            b1_best = jnp.where(h, b1, b1_best)
            b2_best = jnp.where(h, b2, b2_best)

        # --- interior: push far child then near child (near on top)
        interior = hit_box & ~is_leaf
        dir_neg = jnp.take_along_axis(neg, axis[:, None], axis=1)[:, 0]
        near = jnp.where(dir_neg, right, node + 1)
        far = jnp.where(dir_neg, node + 1, right)
        stack = s["stack"]
        # write far at sp, near at sp+1 where interior
        stack = jnp.where(
            interior[:, None]
            & (jnp.arange(STACK_DEPTH)[None, :] == sp[:, None]),
            far[:, None], stack)
        stack = jnp.where(
            interior[:, None]
            & (jnp.arange(STACK_DEPTH)[None, :] == (sp + 1)[:, None]),
            near[:, None], stack)
        sp_new = jnp.where(interior, jnp.minimum(sp + 2, STACK_DEPTH - 1), sp)

        done = s["done"]
        if any_hit:
            done = done | (prim_best >= 0)

        return {"stack": stack, "sp": jnp.where(alive, sp_new, s["sp"]),
                "t": t_best, "prim": prim_best, "b1": b1_best, "b2": b2_best,
                "done": done}

    out = lax.while_loop(cond, body, state)
    return out


def _traverse(scene, o, d, tmax, tmin, any_hit):
    return traverse_tables(scene["bvh"], scene["verts"], scene["tri_idx"],
                           o, d, tmax, tmin, any_hit)


def bvh_intersect(scene, o, d, tmax, tmin=None):
    n = o.shape[0]
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    out = _traverse(scene, o, d, tmax, tmin, any_hit=False)
    hit = out["prim"] >= 0
    return {"t": jnp.where(hit, out["t"], BIG_T), "prim": out["prim"],
            "b1": out["b1"], "b2": out["b2"]}


def bvh_intersect_p(scene, o, d, tmax, tmin=None):
    n = o.shape[0]
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    out = _traverse(scene, o, d, tmax, tmin, any_hit=True)
    return out["prim"] >= 0
