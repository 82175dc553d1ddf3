"""Ray-scene intersection kernels.

pbrt-v2 equivalents: Triangle::Intersect Möller-Trumbore (src/shapes/trianglemesh.cpp
~L150) and BVHAccel::Intersect/IntersectP (src/accelerators/bvh.cpp). Here rays are a
SoA batch; dispatch picks brute-force (small scenes / oracle) or the flattened-BVH
traversal in kernels/bvh_traverse.py. Quadric intersection lives in quadrics.py.

Hit record (dict of (N,) arrays): t, prim (int32, -1 = miss), b1, b2 (barycentrics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import cross, dot

BIG_T = jnp.float32(3.0e37)


def moller_trumbore(o, d, v0, e1, e2, tmin, tmax):
    """Batched Möller-Trumbore. o,d (...,3); v0,e1,e2 (...,3) broadcastable.

    Returns (hit, t, b1, b2). Follows pbrt trianglemesh.cpp: divisor==0 → miss,
    b1,b2 in [0,1], b1+b2<=1, t in (tmin, tmax)."""
    s1 = cross(d, e2)
    divisor = dot(s1, e1)
    inv = 1.0 / jnp.where(divisor == 0.0, 1.0, divisor)
    s = o - v0
    b1 = dot(s, s1) * inv
    s2 = cross(s, e1)
    b2 = dot(d, s2) * inv
    t = dot(e2, s2) * inv
    hit = (
        (divisor != 0.0)
        & (b1 >= 0.0) & (b1 <= 1.0)
        & (b2 >= 0.0) & (b1 + b2 <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return hit, t, b1, b2


def _gather_tri_verts(scene, tri_ids):
    idx = scene["tri_idx"][tri_ids]                      # (...,3)
    v0 = scene["verts"][idx[..., 0]]
    v1 = scene["verts"][idx[..., 1]]
    v2 = scene["verts"][idx[..., 2]]
    return v0, v1 - v0, v2 - v0


def intersect_brute(scene, o, d, tmax, tmin=None):
    """All-pairs rays×triangles (the aggregatetest-style oracle and small-scene path).

    o,d (N,3); tmax (N,). Returns hit dict. Memory O(N*T) — use only when N*T small.
    """
    n = o.shape[0]
    t_count = scene["tri_idx"].shape[0]
    v0, e1, e2 = _gather_tri_verts(scene, jnp.arange(t_count))
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    hit, t, b1, b2 = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
        tmin[:, None], tmax[:, None],
    )  # (N,T)
    t_masked = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(t_masked, axis=1)
    best_t = jnp.take_along_axis(t_masked, best[:, None], axis=1)[:, 0]
    any_hit = best_t < BIG_T
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    return {
        "t": jnp.where(any_hit, best_t, BIG_T),
        "prim": jnp.where(any_hit, best.astype(jnp.int32), -1),
        "b1": take(b1),
        "b2": take(b2),
    }


def intersect_p_brute(scene, o, d, tmax, tmin=None):
    """Shadow-ray occlusion test, brute force. Returns occluded (N,) bool."""
    n = o.shape[0]
    t_count = scene["tri_idx"].shape[0]
    v0, e1, e2 = _gather_tri_verts(scene, jnp.arange(t_count))
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    hit, _, _, _ = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
        tmin[:, None], tmax[:, None],
    )
    return jnp.any(hit, axis=1)


def _pallas_ok():
    import os
    if os.environ.get("GRAIL_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


def _brute_pallas(scene, o, d, tmax, tmin):
    from .pallas_intersect import brute_intersect_pallas, pack_tris
    n = o.shape[0]
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    t, prim, b1, b2 = brute_intersect_pallas(
        pack_tris(scene), o, d, tmin, tmax)
    hit = prim >= 0
    return {"t": jnp.where(hit, t, BIG_T), "prim": prim, "b1": b1, "b2": b2}


def _stream_bvh(scene, o, d, tmax, tmin, any_hit=False, sort=None):
    """Pallas ordered sub-packet streaming traversal, with ray re-binning.

    sort: counting-sort rays into (octant | origin Morton | direction Morton)
    buckets before traversal (kernels/binning.py) so each 128-ray sub-packet
    has a compact BVH working set. On by default for batches >= 8192: the
    sort is a few ms per Mray while incoherent traversal without it is ~30x
    slower than coherent (measured round 3 — secondary/shadow rays are the
    majority of a path render's traversals). Dead lanes (tmax<=tmin, the
    integrator's mask encoding) sort into a trailing bucket, which compacts
    idle wavefront lanes out of live sub-packets. GRAIL_SORT_RAYS=0 disables.
    """
    import os
    if os.environ.get("GRAIL_SORT_RAYS", "") == "0":
        sort = False
    from .bvh_stream import (bvh_stream_intersect,
                             bvh_stream_intersect_coherent,
                             bvh_stream_intersect_p)
    from .pallas_intersect import pack_tris
    n = o.shape[0]
    if sort is None:
        sort = n >= 8192
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    bvh = scene["bvh"]
    tris9 = pack_tris(scene)
    # sort=False marks a tile-ordered camera wave: small per-packet unions →
    # the stackless skip kernel wins 2.3x; sorted/secondary waves keep the
    # ordered kernel's front-to-back pruning (streamvariants_r05.json)
    stream_closest = (bvh_stream_intersect_coherent if sort is False
                      else bvh_stream_intersect)

    def closest(o, d, tmin, tmax):
        if "cstream" in bvh:
            # clustered tables (scene > VMEM): one launch per cluster,
            # min-(t, prim) merge, later clusters culled by the tightened t
            C = bvh["cstream"].shape[0]
            t = jnp.full_like(tmax, BIG_T)
            prim = jnp.full(tmax.shape, -1, jnp.int32)
            b1 = jnp.zeros_like(tmax)
            b2 = jnp.zeros_like(tmax)
            for c in range(C):
                cut = jnp.minimum(tmax, jax.lax.stop_gradient(t))
                tc, pc, b1c, b2c = stream_closest(
                    bvh["cstream"][c], tris9, o, d, tmin, cut)
                closer = (pc >= 0) & (tc < t)
                t = jnp.where(closer, tc, t)
                prim = jnp.where(closer, pc, prim)
                b1 = jnp.where(closer, b1c, b1)
                b2 = jnp.where(closer, b2c, b2)
            return t, prim, b1, b2
        return stream_closest(bvh["stream"], tris9, o, d, tmin, tmax)

    def anyhit(o, d, tmin, tmax):
        if "cstream" in bvh:
            C = bvh["cstream"].shape[0]
            occ = jnp.zeros(tmax.shape, jnp.bool_)
            for c in range(C):
                tmax_c = jnp.where(occ, jnp.float32(-3.0e37), tmax)
                occ = occ | bvh_stream_intersect_p(
                    bvh["cstream"][c], o, d, tmin, tmax_c)
            return occ
        return bvh_stream_intersect_p(bvh["stream"], o, d, tmin, tmax)

    # integrator stages mask inactive lanes with tmax=0 — make those lanes
    # fully inert (no slab test can pass with tmin=+BIG) so they never drive
    # sub-packet traversal; without this a dead lane whose origin is inside
    # the scene bounds walks the whole tree with zero t-culling
    dead = tmax <= tmin
    tmin = jnp.where(dead, jnp.float32(3.0e37), tmin)
    tmax = jnp.where(dead, jnp.float32(-3.0e37), tmax)
    if sort:
        from .binning import (bin_rays_key, bucket_rank, sort_by_rank,
                              unsort, N_RAY_BUCKETS)
        bmin = jnp.min(scene["verts"], axis=0)
        bmax = jnp.max(scene["verts"], axis=0)
        key = bin_rays_key(o, d, bmin, bmax)
        key = jnp.where(dead, N_RAY_BUCKETS, key)     # dead lanes go last
        rank = bucket_rank(key, N_RAY_BUCKETS + 1)
        o_s, d_s, tmin_s, tmax_s = sort_by_rank(rank, o, d, tmin, tmax)
        if any_hit:
            return {"occluded": unsort(rank, anyhit(o_s, d_s, tmin_s,
                                                    tmax_s))[0]}
        t, prim, b1, b2 = closest(o_s, d_s, tmin_s, tmax_s)
        t, prim, b1, b2 = unsort(rank, t, prim, b1, b2)
    else:
        if any_hit:
            return {"occluded": anyhit(o, d, tmin, tmax)}
        t, prim, b1, b2 = closest(o, d, tmin, tmax)
    hit = prim >= 0
    return {"t": jnp.where(hit, t, BIG_T), "prim": prim, "b1": b1, "b2": b2}


def _use_stream(scene):
    if not _pallas_ok():
        return False
    bvh = scene.get("bvh")
    if bvh is not None and "cstream" in bvh:
        return True
    from .bvh_stream import stream_fits_vmem
    return stream_fits_vmem(scene)


def _base_intersect(scene, o, d, tmax, tmin, use_bvh, sort=None):
    if use_bvh is None:
        use_bvh = "bvh" in scene and scene["bvh"] is not None
    if use_bvh:
        if _use_stream(scene):
            return _stream_bvh(scene, o, d, tmax, tmin, sort=sort)
        from .bvh_traverse import bvh_intersect
        return bvh_intersect(scene, o, d, tmax, tmin)
    if _pallas_ok():
        return _brute_pallas(scene, o, d, tmax, tmin)
    return intersect_brute(scene, o, d, tmax, tmin)


def intersect(scene, o, d, tmax, tmin=None, use_bvh=None, time=None,
              sort=None):
    """Scene intersection dispatch (Scene::Intersect analog).

    time (N,): ray times for animated instance transforms (None ⇒ shutter
    open). Scenes with instances return an extra hit field "inst". Scenes
    with a "ring" shard table (P6 scene sharding, dist/scene_shard.py)
    traverse the device ring instead — must be running inside shard_map."""
    if scene.get("ring") is not None:
        from ..dist.scene_shard import ring_intersect
        return ring_intersect(scene["ring"], o, d, tmax, tmin)
    hit = _base_intersect(scene, o, d, tmax, tmin, use_bvh, sort=sort)
    if scene.get("inst") is not None:
        from .instanced import instances_intersect
        t_cut = jnp.minimum(tmax, hit["t"])
        ih = instances_intersect(scene, o, d, t_cut, tmin, time)
        closer = ih["prim"] >= 0           # instanced hit strictly inside t_cut
        out = {k: jnp.where(closer, ih[k], hit[k])
               for k in ("t", "prim", "b1", "b2")}
        out["inst"] = jnp.where(closer, ih["inst"], -1)
        return out
    return hit


def intersect_p(scene, o, d, tmax, tmin=None, use_bvh=None, time=None):
    """Occlusion test dispatch (Scene::IntersectP analog)."""
    if scene.get("ring") is not None:
        from ..dist.scene_shard import ring_intersect
        return ring_intersect(scene["ring"], o, d, tmax, tmin,
                              any_hit=True)["occluded"]
    if use_bvh is None:
        use_bvh = "bvh" in scene and scene["bvh"] is not None
    if use_bvh:
        if _use_stream(scene):
            occ = _stream_bvh(scene, o, d, tmax, tmin,
                              any_hit=True)["occluded"]
        else:
            from .bvh_traverse import bvh_intersect_p
            occ = bvh_intersect_p(scene, o, d, tmax, tmin)
    elif _pallas_ok():
        occ = _brute_pallas(scene, o, d, tmax, tmin)["prim"] >= 0
    else:
        occ = intersect_p_brute(scene, o, d, tmax, tmin)
    if scene.get("inst") is not None:
        from .instanced import instances_intersect
        tmax2 = jnp.where(occ, jnp.float32(-BIG_T), tmax)
        occ = occ | instances_intersect(scene, o, d, tmax2, tmin, time,
                                        any_hit=True)["occluded"]
    return occ
