"""Independent NumPy reference path tracer (SURVEY §4 oracle strategy).

A deliberately simple, vectorized-but-straightforward NumPy implementation of
the pbrt algorithms — its own RNG, its own code paths — consuming the same scene
SoA buffers as the device renderer. Systematic errors (missing cosines, factor-π,
wrong pdf Jacobians) show up as statistically significant image differences;
MC noise does not, because comparisons are against the estimator's expectation
over many samples.

Implements: perspective raygen, brute-force Möller-Trumbore, Lambertian BRDF,
one-light direct lighting via area sampling with shadow rays (NO MIS — a
different unbiased estimator than the device's MIS; expectations still match).
"""
from __future__ import annotations

import numpy as np


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def render_direct(scene_np, xres, yres, spp, seed=0):
    """Returns the expected-value image (H,W,3) for Lambertian direct lighting."""
    rs = np.random.RandomState(seed)
    verts = scene_np["verts"]
    idx = scene_np["tri_idx"]
    tri_mat = scene_np["tri_mat"]
    tri_light = scene_np["tri_light"]
    mat_kd = scene_np["mat_kd"]              # (M,3) resolved constant albedos
    lights = scene_np["lights"]

    r2c = scene_np["raster2cam"]
    c2w = scene_np["cam2world"]

    v0 = verts[idx[:, 0]]
    e1 = verts[idx[:, 1]] - v0
    e2 = verts[idx[:, 2]] - v0
    ng = np.cross(e1, e2)
    ng = _normalize(ng)

    def intersect(o, d, tmax):
        """Batched brute force; returns t, tri, hit mask."""
        s1 = np.cross(d[:, None, :], e2[None])
        div = np.einsum("ntk,tk->nt", s1, e1)
        inv = 1.0 / np.where(div == 0, 1.0, div)
        s = o[:, None, :] - v0[None]
        b1 = np.einsum("ntk,ntk->nt", s, s1) * inv
        s2 = np.cross(s, e1[None])
        b2 = np.einsum("nk,ntk->nt", d, s2)
        b2 = b2 * inv
        t = np.einsum("tk,ntk->nt", e2, s2) * inv
        hit = ((div != 0) & (b1 >= 0) & (b1 <= 1) & (b2 >= 0)
               & (b1 + b2 <= 1) & (t > 1e-4) & (t < tmax[:, None]))
        t = np.where(hit, t, 1e30)
        best = np.argmin(t, axis=1)
        tbest = t[np.arange(len(o)), best]
        return tbest, best, tbest < 1e29

    h, w = yres, xres
    img = np.zeros((h * w, 3))
    n_lights = len(lights)
    for s in range(spp):
        # raygen
        px = np.tile(np.arange(w), h).astype(np.float64)
        py = np.repeat(np.arange(h), w).astype(np.float64)
        raster = np.stack([px + rs.rand(h * w), py + rs.rand(h * w),
                           np.zeros(h * w)], -1)
        pc = raster @ r2c[:3, :3].T + r2c[:3, 3]
        d = _normalize(pc)
        o = np.zeros_like(d)
        o_w = o @ c2w[:3, :3].T + c2w[:3, 3]
        d_w = _normalize(d @ c2w[:3, :3].T)

        t, tri, hit = intersect(o_w, d_w, np.full(h * w, 1e30))
        p = o_w + t[:, None] * d_w
        n = ng[tri]
        n = np.where(np.einsum("nk,nk->n", n, d_w)[:, None] > 0, -n, n)
        kd = mat_kd[tri_mat[tri]]

        # emitted
        li_row = tri_light[tri]
        emitted = np.zeros((h * w, 3))
        for li, l in enumerate(lights):
            facing = np.einsum("nk,nk->n", ng[tri], -d_w) > 0
            sel = hit & (li_row == li) & facing
            emitted[sel] += l["emit"]
        img += emitted

        # direct: pick one light uniformly, sample its area
        lpick = rs.randint(0, n_lights, h * w)
        for li, l in enumerate(lights):
            sel = hit & (lpick == li) & (li_row < 0)
            if not sel.any():
                continue
            ltris = l["tris"]
            areas = l["areas"]
            cdf = np.cumsum(areas) / areas.sum()
            pick = np.searchsorted(cdf, rs.rand(sel.sum()))
            pick = np.clip(pick, 0, len(ltris) - 1)
            lt = np.asarray(ltris)[pick]
            u1, u2 = rs.rand(sel.sum()), rs.rand(sel.sum())
            su = np.sqrt(u1)
            b0, b1 = 1 - su, u2 * su
            lv0 = verts[idx[lt, 0]]
            lv1 = verts[idx[lt, 1]]
            lv2 = verts[idx[lt, 2]]
            pl = b0[:, None] * lv0 + b1[:, None] * lv1 \
                + (1 - b0 - b1)[:, None] * lv2
            nl = _normalize(np.cross(lv1 - lv0, lv2 - lv0))
            vec = pl - p[sel]
            dist = np.linalg.norm(vec, axis=1)
            wi = vec / dist[:, None]
            cos_s = np.einsum("nk,nk->n", n[sel], wi)
            cos_l = np.einsum("nk,nk->n", nl, -wi)
            pdf_w = dist ** 2 / np.maximum(np.abs(cos_l) * areas.sum(), 1e-12)
            # shadow
            so = p[sel] + wi * 1e-3
            _, _, occ = intersect(so, wi, dist * (1 - 2e-3))
            contrib = np.where(
                ((cos_s > 0) & (cos_l > 0) & ~occ)[:, None],
                kd[sel] / np.pi * np.asarray(l["emit"])[None]
                * (cos_s / np.maximum(pdf_w, 1e-12))[:, None] * n_lights,
                0.0)
            img[sel] += contrib
    return (img / spp).reshape(h, w, 3)


def scene_to_oracle(scene, meta, builder):
    """Extract the numpy view the oracle needs from the device scene."""
    import numpy as np
    out = {
        "verts": np.asarray(scene["verts"]),
        "tri_idx": np.asarray(scene["tri_idx"]),
        "tri_mat": np.asarray(scene["tri_mat"]),
        "tri_light": np.asarray(scene["tri_light"]),
        "raster2cam": np.asarray(scene["camera"]["raster2cam"]),
        "cam2world": np.asarray(scene["camera"]["c2w"]["m0"]),
    }
    # constant Kd per material (lobe 0 s0 const texture)
    mats = scene["materials"]
    s0 = np.asarray(mats["s0"])[:, 0]
    tex_const = np.asarray(scene["tex_data"]["const"])
    out["mat_kd"] = tex_const[s0]
    out["lights"] = [
        {"emit": np.asarray(l["emit"]), "tris": l["tris"],
         "areas": np.asarray(l["tri_areas"])}
        for l in builder.lights if "tris" in l]
    return out
