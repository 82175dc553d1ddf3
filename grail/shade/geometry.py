"""Differential geometry at hit points — pbrt src/core/diffgeom.{h,cpp} +
Triangle::GetShadingGeometry (src/shapes/trianglemesh.cpp ~L260) as SoA math.

From a hit record (t, prim, b1, b2) produce the shading SoA: position, geometric
normal, shading normal/tangents (interpolated when the mesh has them), uv, dpdu/dpdv,
and the material/light ids. All gathers; fully vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import cross, dot, normalize, face_forward, coordinate_system

# tri_flags bits
HAS_NS = 1
HAS_UV = 2
HAS_TAN = 4
REVERSE_ORIENTATION = 8
XFORM_SWAPS_HANDEDNESS = 16


def shading_geometry(scene, hit, ray_o, ray_d, time=None):
    """Build the shading record for a batch of hits.

    Misses (prim<0) produce garbage-but-finite entries; callers mask by hit.
    Instanced hits (hit["inst"] >= 0) gather object-space geometry and
    transform it to world with the instance's interpolated transform at the
    ray time (pbrt TransformedPrimitive::Intersect's PrimitiveToWorld apply).
    """
    prim = jnp.maximum(hit["prim"], 0)
    has_inst = None
    if "tri" in hit:
        # P6 ring mode (dist/scene_shard.py): the winning shard carried the
        # triangle's full attribute record — no global mesh gathers
        tri = hit["tri"]
        e1, e2 = tri["e1"], tri["e2"]
        n0, n1, n2 = tri["n0"], tri["n1"], tri["n2"]
        uv0, uv1, uv2 = tri["uv0"], tri["uv1"], tri["uv2"]
        flags = tri["flags"]
        mat_id = tri["mat"]
        light_id = tri["light"]
    else:
        idx = scene["tri_idx"][prim]                    # (N,3)
        v0 = scene["verts"][idx[..., 0]]
        v1 = scene["verts"][idx[..., 1]]
        v2 = scene["verts"][idx[..., 2]]

        inst_tbl = scene.get("inst")
        if inst_tbl is not None and "inst" in hit:
            from ..kernels.instanced import gather_pack, o2w_point, o2w_normal
            ii = hit["inst"]
            has_inst = ii >= 0
            pk = gather_pack(inst_tbl, jnp.maximum(ii, 0))
            t_lane = (time if time is not None
                      else jnp.zeros(ii.shape, jnp.float32))
            mI = has_inst[..., None]
            v0 = jnp.where(mI, o2w_point(pk, t_lane, v0), v0)
            v1 = jnp.where(mI, o2w_point(pk, t_lane, v1), v1)
            v2 = jnp.where(mI, o2w_point(pk, t_lane, v2), v2)
        e1 = v1 - v0
        e2 = v2 - v0
        n0 = scene["vnorm"][idx[..., 0]]
        n1 = scene["vnorm"][idx[..., 1]]
        n2 = scene["vnorm"][idx[..., 2]]
        if has_inst is not None:
            n0 = jnp.where(mI, o2w_normal(pk, t_lane, n0), n0)
            n1 = jnp.where(mI, o2w_normal(pk, t_lane, n1), n1)
            n2 = jnp.where(mI, o2w_normal(pk, t_lane, n2), n2)
        uv0 = scene["vuv"][idx[..., 0]]
        uv1 = scene["vuv"][idx[..., 1]]
        uv2 = scene["vuv"][idx[..., 2]]
        flags = scene["tri_flags"][prim]
        mat_id = scene["tri_mat"][prim]
        light_id = scene["tri_light"][prim]

    b1 = hit["b1"][..., None]
    b2 = hit["b2"][..., None]
    b0 = 1.0 - b1 - b2

    # Clamp the miss sentinel (t = 3e37) before forming p: a hit always has
    # t < 1e7 (the dispatch tmax), but an unclamped miss lane overflows
    # downstream distance math to inf — masked in the forward pass, yet fatal
    # in reverse mode (0 cotangent x inf = NaN poisons gradients of every
    # operand the masked expression shares, e.g. image-texture texels).
    t_safe = jnp.minimum(hit["t"], 1.0e7)
    p = ray_o + t_safe[..., None] * ray_d
    ng = normalize(cross(e1, e2))

    rev = (flags & REVERSE_ORIENTATION) != 0
    swap = (flags & XFORM_SWAPS_HANDEDNESS) != 0
    if has_inst is not None:
        swap = swap ^ (has_inst & inst_tbl["swap"][jnp.maximum(hit["inst"], 0)])
    flip = rev ^ swap
    ng = jnp.where(flip[..., None], -ng, ng)

    # uv: default parameterization (0,0),(1,0),(1,1) as pbrt TriangleMesh::GetUVs
    has_uv = ((flags & HAS_UV) != 0)[..., None]
    uv_default = jnp.concatenate(
        [b1 + b2, b2], axis=-1)  # (u,v) = b1*(1,0)+b2*(1,1)
    uv = jnp.where(has_uv, b0 * uv0 + b1 * uv1 + b2 * uv2, uv_default)

    # dpdu/dpdv from uv deltas (pbrt Triangle::Intersect 2x2 solve)
    du1 = jnp.where(has_uv[..., 0], uv1[..., 0] - uv0[..., 0], 1.0)
    du2 = jnp.where(has_uv[..., 0], uv2[..., 0] - uv0[..., 0], 1.0)
    dv1 = jnp.where(has_uv[..., 0], uv1[..., 1] - uv0[..., 1], 0.0)
    dv2 = jnp.where(has_uv[..., 0], uv2[..., 1] - uv0[..., 1], 1.0)
    det = du1 * dv2 - dv1 * du2
    degen = jnp.abs(det) < 1e-12
    invdet = 1.0 / jnp.where(degen, 1.0, det)
    dpdu = (dv2[..., None] * e1 - dv1[..., None] * e2) * invdet[..., None]
    dpdv = (-du2[..., None] * e1 + du1[..., None] * e2) * invdet[..., None]
    t1, t2 = coordinate_system(ng)
    dpdu = jnp.where(degen[..., None], t1, dpdu)
    dpdv = jnp.where(degen[..., None], t2, dpdv)

    # shading normal: interpolate vertex normals if present
    has_ns = ((flags & HAS_NS) != 0)[..., None]
    # guard the no-normals branch: vnorm rows are zeros there, and
    # normalize(0) = NaN would be masked in the forward pass but poison
    # reverse-mode grads (0 cotangent x NaN) of everything sharing operands
    n_sum = b0 * n0 + b1 * n1 + b2 * n2
    n_sum = jnp.where(has_ns, n_sum, jnp.asarray([0.0, 0.0, 1.0]))
    ns_interp = normalize(n_sum)
    ns_interp = jnp.where(rev[..., None], -ns_interp, ns_interp)
    ns = jnp.where(has_ns, ns_interp, ng)
    # keep ng on the same side as ns (pbrt GetShadingGeometry Faceforward)
    ng = face_forward(ng, ns)

    # shading frame (ss, ts, ns): orthonormalize dpdu against ns
    ss = normalize(dpdu - ns * dot(ns, dpdu)[..., None])
    bad_ss = jnp.sum(jnp.abs(ss), axis=-1) < 1e-9
    ss_fb, _ = coordinate_system(ns)
    ss = jnp.where(bad_ss[..., None], ss_fb, ss)
    ts = cross(ns, ss)

    return {
        "p": p,
        "ng": ng,
        "ns": ns,
        "ss": ss,
        "ts": ts,
        "uv": uv,
        "dpdu": dpdu,
        "dpdv": dpdv,
        "mat": mat_id,
        "light": light_id,
        "ray_eps": 1e-3 * t_safe,   # pbrt Triangle::Intersect rayEpsilon policy
    }


def hit_geometric(scene, hit):
    """Lean hit record: orientation-corrected geometric normal + light id only.

    estimate_direct's BSDF-sampling branch needs just these two to evaluate
    Le and the light pdf at the hit (pbrt Intersection::Le) — the full
    shading_geometry (uv/tangents/derivs) costs ~15 ms/Mray more."""
    if "tri" in hit:   # ring mode: carried record
        tri = hit["tri"]
        ng = normalize(cross(tri["e1"], tri["e2"]))
        flags = tri["flags"]
        light = tri["light"]
    else:
        prim = jnp.maximum(hit["prim"], 0)
        idx = scene["tri_idx"][prim]
        v0 = scene["verts"][idx[..., 0]]
        v1 = scene["verts"][idx[..., 1]]
        v2 = scene["verts"][idx[..., 2]]
        ng = normalize(cross(v1 - v0, v2 - v0))
        flags = scene["tri_flags"][prim]
        light = scene["tri_light"][prim]
    flip = (((flags & REVERSE_ORIENTATION) != 0)
            ^ ((flags & XFORM_SWAPS_HANDEDNESS) != 0))
    ng = jnp.where(flip[..., None], -ng, ng)
    return {"ng": ng, "light": light}


def world_to_local(sg, w):
    """World direction → shading frame (pbrt BSDF::WorldToLocal)."""
    return jnp.stack([dot(w, sg["ss"]), dot(w, sg["ts"]), dot(w, sg["ns"])], axis=-1)


def local_to_world(sg, w):
    return (w[..., 0:1] * sg["ss"] + w[..., 1:2] * sg["ts"] + w[..., 2:3] * sg["ns"])


def uv_differentials(sg, rx_o, rx_d, ry_o, ry_d):
    """DifferentialGeometry::ComputeDifferentials (pbrt diffgeom.cpp ~L30):
    intersect the x/y offset rays with the tangent plane at p, then solve the
    2x2 system dpdx = dudx*dpdu + dvdx*dpdv for the uv screen derivatives.

    Returns (duvdx, duvdy), each (N,2). Degenerate configurations (offset ray
    parallel to the plane) produce zeros, matching pbrt's hasDifferentials
    fallback."""
    p, ng = sg["p"], sg["ng"]
    dist = dot(ng, p)

    def plane_hit(o, d):
        denom = dot(ng, d)
        tt = (dist - dot(ng, o)) / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
        ok = jnp.abs(denom) >= 1e-9
        return o + tt[..., None] * d, ok

    px, okx = plane_hit(rx_o, rx_d)
    py, oky = plane_hit(ry_o, ry_d)
    dpdx = px - p
    dpdy = py - p

    # pick the two dimensions where the normal is smallest (diffgeom.cpp)
    an = jnp.abs(ng)
    # axes as one-hot selections: drop the largest-|n| axis
    drop = jnp.argmax(an, axis=-1)                       # (N,)
    ax0 = jnp.where(drop == 0, 1, 0)
    ax1 = jnp.where(drop == 2, 1, 2)

    def pick(v, a):
        # one-hot contraction over the 3 components (fast-TPU indexing rule)
        oh = (a[..., None] == jnp.arange(3, dtype=jnp.int32)).astype(v.dtype)
        return jnp.sum(v * oh, axis=-1)

    A00 = pick(sg["dpdu"], ax0)
    A01 = pick(sg["dpdv"], ax0)
    A10 = pick(sg["dpdu"], ax1)
    A11 = pick(sg["dpdv"], ax1)
    det = A00 * A11 - A01 * A10
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    solvable = jnp.abs(det) >= 1e-12

    def solve(b):
        b0 = pick(b, ax0)
        b1 = pick(b, ax1)
        return ((A11 * b0 - A01 * b1) * inv, (A00 * b1 - A10 * b0) * inv)

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    okx = okx & solvable
    oky = oky & solvable
    duvdx = jnp.stack([jnp.where(okx, dudx, 0.0),
                       jnp.where(okx, dvdx, 0.0)], axis=-1)
    duvdy = jnp.stack([jnp.where(oky, dudy, 0.0),
                       jnp.where(oky, dvdy, 0.0)], axis=-1)
    return duvdx, duvdy
