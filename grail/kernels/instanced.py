"""Two-level (TLAS/BLAS) instanced intersection — the TPU re-design of pbrt's
TransformedPrimitive (src/core/primitive.cpp: interpolate the animated
PrimitiveToWorld at ray.time, transform the ray to object space, intersect the
shared inner aggregate, return the hit in world space).

Design: the top level is a *dense* cull — every ray slab-tests every instance's
conservative motion-bound AABB and visits its candidates in near-ascending
order with t-culling (a lexicographic (near, id) sweep carried in two scalars
per lane, so no per-lane candidate list is materialized). Each sweep round runs
the masked BLAS traversal (kernels/bvh_traverse.traverse_tables) over the
concatenated object node tables with a per-lane subtree root. Dense culling is
the same FLOPs-for-hierarchy trade the rest of the framework makes (SURVEY
§2.1 octree note): for instance counts up to a few thousand the (N,I) slab
test fuses into a reduction and beats a second irregular tree walk on TPU.

t parameterization: the object-space ray uses the *unnormalized* transformed
direction, so hit t, tmin and tmax carry over between spaces unchanged.

Transforms ride as per-instance decomposed pairs (T, R quaternion, S) and are
interpolated per lane at ray time exactly like AnimatedTransform::Interpolate
(lerp-T / slerp-R / lerp-S); the world-to-object apply uses the closed affine
inverse S⁻¹·Rᵀ·(p−T) (S from polar decomposition is symmetric), so no 4x4
inversion happens on device.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.transform import slerp, quat_rotate
from .bvh_traverse import traverse_tables
from .intersect import BIG_T


def _lerp_keys(a, time):
    """a (N,2,...) per-lane key pair → interpolated at time (N,)."""
    t = time.reshape(time.shape + (1,) * (a.ndim - 2))
    return (1.0 - t) * a[:, 0] + t * a[:, 1]


def _inv3x3(m):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a = m[..., 0, :]
    b = m[..., 1, :]
    c = m[..., 2, :]
    r0 = jnp.cross(b, c)
    r1 = jnp.cross(c, a)
    r2 = jnp.cross(a, b)
    det = jnp.sum(a * r0, axis=-1, keepdims=True)
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    return jnp.stack([r0, r1, r2], axis=-2) / det[..., None]


def gather_pack(inst, ids):
    """Per-lane transform pack rows for instance ids (N,)."""
    return {k: inst[k][ids] for k in ("t", "q", "s", "anim", "m0", "m0_inv")}


def _interp(pk, time):
    T = _lerp_keys(pk["t"], time)
    q = slerp(time, pk["q"][:, 0], pk["q"][:, 1])
    S = _lerp_keys(pk["s"], time)
    return T, q, S


def o2w_point(pk, time, p):
    T, q, S = _interp(pk, time)
    out = quat_rotate(q, jnp.einsum("njk,nk->nj", S, p,
                                    precision="highest")) + T
    fixed = jnp.einsum("nij,nj->ni", pk["m0"][:, :3, :3], p,
                       precision="highest") + pk["m0"][:, :3, 3]
    return jnp.where(pk["anim"][:, None], out, fixed)


def o2w_normal(pk, time, nrm):
    """Normals transform by (M⁻¹)ᵀ = R·S⁻¹ (S symmetric)."""
    T, q, S = _interp(pk, time)
    out = quat_rotate(q, jnp.einsum("njk,nk->nj", _inv3x3(S), nrm,
                                    precision="highest"))
    fixed = jnp.einsum("nji,nj->ni", pk["m0_inv"][:, :3, :3], nrm,
                       precision="highest")
    return jnp.where(pk["anim"][:, None], out, fixed)


def w2o_ray(pk, time, o, d):
    """Ray to object space; d is NOT normalized (t carries over)."""
    T, q, S = _interp(pk, time)
    qc = jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)  # conjugate
    Sinv = _inv3x3(S)
    o_r = jnp.einsum("njk,nk->nj", Sinv, quat_rotate(qc, o - T),
                     precision="highest")
    d_r = jnp.einsum("njk,nk->nj", Sinv, quat_rotate(qc, d),
                     precision="highest")
    mi = pk["m0_inv"]
    o_f = jnp.einsum("nij,nj->ni", mi[:, :3, :3], o,
                     precision="highest") + mi[:, :3, 3]
    d_f = jnp.einsum("nij,nj->ni", mi[:, :3, :3], d, precision="highest")
    anim = pk["anim"][:, None]
    return jnp.where(anim, o_r, o_f), jnp.where(anim, d_r, d_f)


def _instance_nears(inst, o, d, tmin, tcur):
    """(N,I) slab-entry t against each instance's motion-bound world AABB, or
    BIG_T when culled (miss, behind tmin, or past the current best t)."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d < 0, -1e-20, 1e-20), d)
    t0 = (inst["wmin"][None] - o[:, None]) * inv_d[:, None]   # (N,I,3)
    t1 = (inst["wmax"][None] - o[:, None]) * inv_d[:, None]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.0000004
    ok = (near <= far) & (far > tmin[:, None]) & (near < tcur[:, None])
    return jnp.where(ok, jnp.maximum(near, tmin[:, None]), BIG_T)


def _use_stream_blas(scene, I):
    """Route BLAS traversal through the Pallas stream kernel when the
    per-object record table was built (fits VMEM) and the instance count
    suits the counting-sort (K = I+1 buckets). GRAIL_INST_STREAM=0 forces
    the jnp walk; =force enables it on CPU (interpret-mode tests)."""
    import os
    mode = os.environ.get("GRAIL_INST_STREAM", "")
    if mode == "0":
        return False
    if "stream" not in scene["inst"]:
        return False
    if mode == "force":
        return True
    from .intersect import _pallas_ok
    return _pallas_ok() and I <= 128


def instances_intersect(scene, o, d, tmax, tmin=None, time=None,
                        any_hit=False):
    """Closest hit (or occlusion) against all instanced geometry.

    Returns {t, prim (global tri id), b1, b2, inst} — prim=-1/inst=-1 on miss;
    any_hit=True returns {occluded}. time (N,) in [0,1] selects the animated
    instance transform (None ⇒ shutter open)."""
    import jax
    inst = scene["inst"]
    n = o.shape[0]
    I = inst["root"].shape[0]
    if _use_stream_blas(scene, I):
        return _instances_intersect_stream(scene, o, d, tmax, tmin, time,
                                           any_hit)
    ids = jnp.arange(I, dtype=jnp.int32)
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    if time is None:
        time = jnp.zeros((n,), jnp.float32)

    state = {
        "t": tmax, "prim": jnp.full((n,), -1, jnp.int32),
        "b1": jnp.zeros((n,), jnp.float32), "b2": jnp.zeros((n,), jnp.float32),
        "inst": jnp.full((n,), -1, jnp.int32),
        "last_near": jnp.full((n,), -BIG_T, jnp.float32),
        "last_id": jnp.full((n,), -1, jnp.int32),
        "occ": jnp.zeros((n,), jnp.bool_),
        "go": jnp.ones((), jnp.bool_),
    }

    def cond(s):
        return s["go"]

    def body(s):
        nr = _instance_nears(inst, o, d, tmin, s["t"])
        # visit candidates in lexicographic (near, id) order: strictly after
        # the last visited pair, argmin picks the first (lowest-id) minimum
        elig = (nr > s["last_near"][:, None]) \
            | ((nr == s["last_near"][:, None]) & (ids[None] > s["last_id"][:, None]))
        if any_hit:
            elig = elig & ~s["occ"][:, None]
        nrm = jnp.where(elig, nr, BIG_T)
        sel = jnp.argmin(nrm, axis=1).astype(jnp.int32)
        selnear = jnp.take_along_axis(nrm, sel[:, None], 1)[:, 0]
        lane_act = selnear < BIG_T

        pk = gather_pack(inst, sel)
        o_obj, d_obj = w2o_ray(pk, time, o, d)
        root = inst["root"][sel]
        sub_tmax = jnp.where(lane_act, s["t"], -BIG_T)
        out = traverse_tables(inst["blas"], scene["verts"], scene["tri_idx"],
                              o_obj, d_obj, sub_tmax, tmin, any_hit, root=root)
        closer = out["prim"] >= 0
        return {
            "t": jnp.where(closer, out["t"], s["t"]),
            "prim": jnp.where(closer, out["prim"], s["prim"]),
            "b1": jnp.where(closer, out["b1"], s["b1"]),
            "b2": jnp.where(closer, out["b2"], s["b2"]),
            "inst": jnp.where(closer, sel, s["inst"]),
            "last_near": jnp.where(lane_act, selnear, s["last_near"]),
            "last_id": jnp.where(lane_act, sel, s["last_id"]),
            "occ": s["occ"] | closer,
            "go": jnp.any(lane_act),
        }

    out = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return {"occluded": out["occ"]}
    hit = out["prim"] >= 0
    return {"t": jnp.where(hit, out["t"], BIG_T), "prim": out["prim"],
            "b1": out["b1"], "b2": out["b2"], "inst": out["inst"]}


def _instances_intersect_stream(scene, o, d, tmax, tmin=None, time=None,
                                any_hit=False):
    """The instanced sweep with BLAS traversal on the Pallas stream kernel
    (round-5: replaces the jnp `traverse_tables` walk, which was the last
    non-stream traversal in the hot path — pbrt TransformedPrimitive's
    'instancing is cheap' contract, src/core/primitive.cpp).

    Per sweep round: each lane picks its next-nearest candidate instance
    (same lexicographic (near, id) sweep as the dense path) and transforms
    its ray into that instance's object space; streams then traverse the
    per-object record table with an OBJECT-root start record (scene build
    concatenates per-object streams with offset pointers;
    SceneBuilder.finalize). Instances of one object share a table root, so
    grouping is by OBJECT: with a single object (the common instancing
    shape) no grouping is needed at all; with several, lanes counting-sort
    by object id — far fewer buckets and permutes than per-instance
    grouping, and only the <=O-1 boundary streams mask any lanes (those are
    re-offered the same candidate next round; a stream's lead lane always
    matches itself, so progress is guaranteed). Object-space t carries over
    unchanged (unnormalized direction), so hits merge exactly like the
    dense path's."""
    import jax
    from .bvh_stream import bvh_stream_intersect, bvh_stream_intersect_p, LANES
    from .binning import bucket_rank, sort_by_rank
    from .pallas_intersect import pack_tris

    inst = scene["inst"]
    n = o.shape[0]
    I = inst["root"].shape[0]
    O = inst["obj_roots"].shape[0]
    ids = jnp.arange(I, dtype=jnp.int32)
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    if time is None:
        time = jnp.zeros((n,), jnp.float32)
    table = inst["stream"]
    tris9 = pack_tris(scene)
    n_streams = -(-n // LANES)
    n_pad = n_streams * LANES

    state = {
        "t": tmax, "prim": jnp.full((n,), -1, jnp.int32),
        "b1": jnp.zeros((n,), jnp.float32), "b2": jnp.zeros((n,), jnp.float32),
        "inst": jnp.full((n,), -1, jnp.int32),
        "last_near": jnp.full((n,), -BIG_T, jnp.float32),
        "last_id": jnp.full((n,), -1, jnp.int32),
        "occ": jnp.zeros((n,), jnp.bool_),
        "go": jnp.ones((), jnp.bool_),
    }

    def cond(s):
        return s["go"]

    def body(s):
        nr = _instance_nears(inst, o, d, tmin, s["t"])
        elig = (nr > s["last_near"][:, None]) \
            | ((nr == s["last_near"][:, None])
               & (ids[None] > s["last_id"][:, None]))
        if any_hit:
            elig = elig & ~s["occ"][:, None]
        nrm = jnp.where(elig, nr, BIG_T)
        sel = jnp.argmin(nrm, axis=1).astype(jnp.int32)
        selnear = jnp.take_along_axis(nrm, sel[:, None], 1)[:, 0]
        lane_act = selnear < BIG_T

        pk = gather_pack(inst, sel)
        o_obj, d_obj = w2o_ray(pk, time, o, d)
        sub_tmax = jnp.where(lane_act, s["t"], -BIG_T)
        sub_tmin = jnp.where(lane_act, tmin, BIG_T)

        if O == 1:
            # every instance shares the one object's table root: no grouping
            starts = jnp.broadcast_to(inst["obj_roots"][0], (n_streams,))
            if any_hit:
                occ_r = bvh_stream_intersect_p(table, o_obj, d_obj, sub_tmin,
                                               sub_tmax, starts=starts)
            else:
                t_r, prim_r, b1_r, b2_r = bvh_stream_intersect(
                    table, tris9, o_obj, d_obj, sub_tmin, sub_tmax, starts)
            processed = lane_act
        else:
            # object-uniform streams: sort lanes by object (dead → bucket O)
            obj = inst["obj"][sel]
            key = jnp.where(lane_act, obj, O)
            rank = bucket_rank(key, O + 1)
            o_s, d_s, tmin_s, tmax_s, key_s = sort_by_rank(
                rank, o_obj, d_obj, sub_tmin, sub_tmax, key)
            key_p = jnp.concatenate(
                [key_s, jnp.full((n_pad - n,), O, jnp.int32)])
            lead = key_p.reshape(n_streams, LANES)[:, 0]   # stream's object
            starts = jnp.where(
                lead < O, inst["obj_roots"][jnp.minimum(lead, O - 1)], -1)
            mismatch = key_s != jnp.repeat(lead, LANES)[:n]
            tmax_s = jnp.where(mismatch, -BIG_T, tmax_s)
            tmin_s = jnp.where(mismatch, BIG_T, tmin_s)

            if any_hit:
                occ_s = bvh_stream_intersect_p(table, o_s, d_s, tmin_s,
                                               tmax_s, starts=starts)
                occ_r = occ_s[rank]
            else:
                t_s, prim_s, b1_s, b2_s = bvh_stream_intersect(
                    table, tris9, o_s, d_s, tmin_s, tmax_s, starts)
                t_r, prim_r, b1_r, b2_r = (t_s[rank], prim_s[rank],
                                           b1_s[rank], b2_s[rank])
            processed = lane_act & ~mismatch[rank]

        if any_hit:
            closer = occ_r & processed
            t_new, prim_new, b1_new, b2_new = s["t"], s["prim"], s["b1"], s["b2"]
            inst_new = s["inst"]
        else:
            closer = (prim_r >= 0) & processed
            t_new = jnp.where(closer, t_r, s["t"])
            prim_new = jnp.where(closer, prim_r, s["prim"])
            b1_new = jnp.where(closer, b1_r, s["b1"])
            b2_new = jnp.where(closer, b2_r, s["b2"])
            inst_new = jnp.where(closer, sel, s["inst"])
        return {
            "t": t_new, "prim": prim_new, "b1": b1_new, "b2": b2_new,
            "inst": inst_new,
            "last_near": jnp.where(processed, selnear, s["last_near"]),
            "last_id": jnp.where(processed, sel, s["last_id"]),
            "occ": s["occ"] | closer,
            "go": jnp.any(lane_act),
        }

    out = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return {"occluded": out["occ"]}
    hit = out["prim"] >= 0
    return {"t": jnp.where(hit, out["t"], BIG_T), "prim": out["prim"],
            "b1": out["b1"], "b2": out["b2"], "inst": out["inst"]}
