"""Full-path NumPy oracle with MATCHED counter-based RNG (SURVEY §4 leg 1).

An independent NumPy reimplementation of the complete path estimator — MIS
direct lighting (pbrt integrator.cpp EstimateDirect), cosine BSDF sampling,
Russian roulette, specular flags — that consumes the SAME (pixel, sample,
dimension) counter-based sample stream as the device integrator
(grail/core/rng.py, dimension layout grail/engine/integrator.py). Every
discrete decision (light triangle pick, RR survival) and every continuous
sample therefore matches the device per (pixel, sample), so radiance can be
compared PER SAMPLE, not just in expectation — the strongest oracle the
survey's test strategy calls for (pbrt has no analog; its RNG is stateful).

Scope: matte (Lambertian) materials, one diffuse area light, perspective
camera, no media/env — the Cornell configuration (BASELINE config 1/2).
The RNG itself is asserted bitwise against the device generator in
tests/test_oracle.py; radiance comparisons use quantile tolerances because
the oracle runs float64 while the device runs float32.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------- RNG
# NumPy mirror of grail/core/rng.py (ZERO_TWO sampler). uint32 wraparound is
# numpy's native behavior for unsigned arrays.

_INV_U32 = np.float32(2.3283064365386963e-10)
_ONE_MINUS_EPS = np.float32(1.0 - 2.0 ** -24)


def _u32(x):
    return np.asarray(x).astype(np.uint32)


def pcg_hash(x):
    x = _u32(x)
    state = x * np.uint32(747796405) + np.uint32(2891336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) \
        * np.uint32(277803737)
    return (word >> np.uint32(22)) ^ word


def hash_combine(a, b):
    a = _u32(a)
    b = _u32(b)
    return pcg_hash(a ^ (b + np.uint32(0x9E3779B9) + (a << np.uint32(6))
                         + (a >> np.uint32(2))))


def hash3(a, b, c):
    return hash_combine(hash_combine(a, b), c)


def u32_to_float(u):
    return np.minimum(_u32(u).astype(np.float32) * _INV_U32, _ONE_MINUS_EPS)


def reverse_bits32(n):
    n = _u32(n)
    n = (n << np.uint32(16)) | (n >> np.uint32(16))
    n = ((n & np.uint32(0x00FF00FF)) << np.uint32(8)) \
        | ((n & np.uint32(0xFF00FF00)) >> np.uint32(8))
    n = ((n & np.uint32(0x0F0F0F0F)) << np.uint32(4)) \
        | ((n & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    n = ((n & np.uint32(0x33333333)) << np.uint32(2)) \
        | ((n & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    n = ((n & np.uint32(0x55555555)) << np.uint32(1)) \
        | ((n & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    return n


def van_der_corput(n, scramble):
    return u32_to_float(reverse_bits32(n) ^ _u32(scramble))


def sobol2(n, scramble):
    n = _u32(np.array(n, copy=True))
    result = _u32(scramble) * np.ones_like(n)
    v = np.uint32(1 << 31)
    for _ in range(32):
        result = np.where((n & np.uint32(1)) != 0, result ^ v, result)
        n = n >> np.uint32(1)
        v = v ^ (v >> np.uint32(1))
    return u32_to_float(result)


def sample_1d(pix, samp, dim, seed=0):
    """ZERO_TWO sampler, matching rng.sample_1d bitwise."""
    scramble = hash3(_u32(pix) ^ np.uint32(seed), _u32(dim),
                     np.uint32(0xA511E9B3))
    return van_der_corput(_u32(samp), scramble)


def sample_2d(pix, samp, dim, seed=0):
    pixs = _u32(pix) ^ np.uint32(seed)
    s0 = hash3(pixs, _u32(dim), np.uint32(0xA511E9B3))
    s1 = hash3(pixs, _u32(dim), np.uint32(0x63D83595))
    return van_der_corput(_u32(samp), s0), sobol2(_u32(samp), s1)


# ----------------------------------------------------------- sampler layout
# must match grail/engine/integrator.py
SLOT_FILM = 0
_BOUNCE_BASE = 4
_BOUNCE_STRIDE = 8
D_LIGHT_SEL, D_LIGHT_POS, D_LIGHT_TRI, D_BSDF_COMP, D_BSDF_DIR, D_RR, \
    D_MIS_COMP, D_MIS_DIR = range(8)


def _bdim(bounce, off):
    return _BOUNCE_BASE + bounce * _BOUNCE_STRIDE + off


# ------------------------------------------------------------------ helpers
def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _dot(a, b):
    return np.einsum("...k,...k->...k"[:9] + "->...", a, b) \
        if False else np.sum(a * b, axis=-1)


def _xform_p(m, p):
    q = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3] + m[3, 3]
    return q / w[..., None]


def concentric_sample_disk(u1, u2):
    sx = 2.0 * u1 - 1.0
    sy = 2.0 * u2 - 1.0
    zero = (sx == 0.0) & (sy == 0.0)
    use_x = np.abs(sx) > np.abs(sy)
    r = np.where(use_x, sx, sy)
    theta = np.where(
        use_x,
        (np.pi / 4.0) * (sy / np.where(sx == 0.0, 1.0, sx)),
        (np.pi / 2.0) - (np.pi / 4.0) * (sx / np.where(sy == 0.0, 1.0, sy)))
    dx = np.where(zero, 0.0, r * np.cos(theta))
    dy = np.where(zero, 0.0, r * np.sin(theta))
    return dx, dy


def cosine_sample_hemisphere(u1, u2):
    dx, dy = concentric_sample_disk(u1, u2)
    z = np.sqrt(np.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return np.stack([dx, dy, z], -1)


def power_heuristic(fp, gp):
    f = fp
    g = gp
    return (f * f) / np.maximum(f * f + g * g, 1e-12)


def luminance(rgb):
    return (0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1]
            + 0.072169 * rgb[..., 2])


# -------------------------------------------------------------------- scene
def extract(scene, meta, builder):
    """NumPy view of the device scene (matte + one area light assumed)."""
    mats = scene["materials"]
    s0 = np.asarray(mats["s0"])[:, 0]
    tex_const = np.asarray(scene["tex_data"]["const"])
    cam = scene["camera"]
    light = next(l for l in builder.lights if "tris" in l)
    areas = np.asarray(light["tri_areas"], np.float64)
    total = float(areas.sum())
    return {
        "verts": np.asarray(scene["verts"], np.float64),
        "tri_idx": np.asarray(scene["tri_idx"]),
        "tri_mat": np.asarray(scene["tri_mat"]),
        "tri_light": np.asarray(scene["tri_light"]),
        "tri_flags": np.asarray(scene["tri_flags"]),
        "mat_kd": tex_const[s0].astype(np.float64),
        "raster2cam": np.asarray(cam["raster2cam"], np.float64),
        "cam2world": np.asarray(cam["c2w"]["m0"], np.float64),
        "light_emit": np.asarray(light["emit"], np.float64),
        "light_tris": np.asarray(light["tris"], np.int64),
        # float32 CDF exactly as the device table so the discrete triangle
        # pick matches bitwise
        "light_cdf": np.concatenate(
            [[0.0], np.cumsum(areas) / max(total, 1e-12)]).astype(np.float32),
        "light_area": total,
    }


class _Tracer:
    def __init__(self, sc):
        self.sc = sc
        idx = sc["tri_idx"]
        v = sc["verts"]
        self.v0 = v[idx[:, 0]]
        self.e1 = v[idx[:, 1]] - self.v0
        self.e2 = v[idx[:, 2]] - self.v0
        ng = np.cross(self.e1, self.e2)
        self.ng_raw = _normalize(ng)
        flags = sc["tri_flags"]
        flip = (((flags & 8) != 0) ^ ((flags & 16) != 0))   # REV ^ SWAP
        self.ng = np.where(flip[:, None], -self.ng_raw, self.ng_raw)

    def intersect(self, o, d, tmax):
        """Brute Möller-Trumbore, pbrt conventions (divisor==0 → miss,
        t in (0, tmax) strict). Returns (t, prim, b1, b2); prim=-1 on miss."""
        s1 = np.cross(d[:, None, :], self.e2[None])
        div = np.einsum("ntk,tk->nt", s1, self.e1)
        inv = 1.0 / np.where(div == 0.0, 1.0, div)
        s = o[:, None, :] - self.v0[None]
        b1 = np.einsum("ntk,ntk->nt", s, s1) * inv
        s2 = np.cross(s, self.e1[None])
        b2 = np.einsum("nk,ntk->nt", d, s2) * inv
        t = np.einsum("tk,ntk->nt", self.e2, s2) * inv
        hit = ((div != 0.0) & (b1 >= 0) & (b1 <= 1) & (b2 >= 0)
               & (b1 + b2 <= 1) & (t > 0.0) & (t < tmax[:, None]))
        tm = np.where(hit, t, 3.0e37)
        best = np.argmin(tm, axis=1)
        lane = np.arange(len(o))
        tb = tm[lane, best]
        ok = tb < 3.0e37
        return (np.where(ok, tb, 3.0e37),
                np.where(ok, best, -1).astype(np.int64),
                b1[lane, best], b2[lane, best])

    def occluded(self, o, d, tmax):
        t, prim, _, _ = self.intersect(o, d, tmax)
        return prim >= 0


def _shading_frame(tr, prim, o, d, t):
    """Mirror of shade/geometry.py for meshes without uvs/normals."""
    prim_c = np.maximum(prim, 0)
    t_safe = np.minimum(t, 1.0e7)
    p = o + t_safe[:, None] * d
    ng = tr.ng[prim_c]
    ns = ng
    # default uv parameterization: du1=du2=1, dv1=0, dv2=1 → det=1
    e1 = tr.e1[prim_c]
    e2 = tr.e2[prim_c]
    dpdu = e1 * 1.0 - 0.0 * e2        # dv2*e1 - dv1*e2
    # flip of ng does not flip dpdu (matches device: dpdu from raw edges)
    ss = _normalize(dpdu - ns * _dot(ns, dpdu)[:, None])
    bad = np.sum(np.abs(ss), axis=-1) < 1e-9
    if bad.any():   # coordinate_system fallback — rare for cornell quads
        fx = np.where(np.abs(ng[:, 0]) > np.abs(ng[:, 1]),
                      np.stack([-ng[:, 2], np.zeros(len(ng)), ng[:, 0]], -1)
                      / np.linalg.norm(
                          np.stack([ng[:, 0], np.zeros(len(ng)), ng[:, 2]],
                                   -1), axis=-1, keepdims=True),
                      np.stack([np.zeros(len(ng)), ng[:, 2], -ng[:, 1]], -1)
                      / np.linalg.norm(
                          np.stack([np.zeros(len(ng)), ng[:, 1], ng[:, 2]],
                                   -1), axis=-1, keepdims=True))
        ss = np.where(bad[:, None], fx, ss)
    ts = np.cross(ns, ss)
    return {"p": p, "ng": ng, "ns": ns, "ss": ss, "ts": ts,
            "eps": 1e-3 * t_safe}


def _to_local(sg, w):
    return np.stack([_dot(w, sg["ss"]), _dot(w, sg["ts"]),
                     _dot(w, sg["ns"])], -1)


def _to_world(sg, w):
    return (w[:, 0:1] * sg["ss"] + w[:, 1:2] * sg["ts"]
            + w[:, 2:3] * sg["ns"])


def path_radiance(sc, pix, samp, xres, max_depth=5, rr_depth=3, seed=0):
    """Per-sample radiance L (N,3) for pixel ids `pix`, sample indices `samp`.

    Mirrors grail/engine/integrator.li (path kind) decision-for-decision on
    the matched sample stream."""
    tr = _Tracer(sc)
    n = len(pix)
    BIG = 1.0e7

    # raygen (perspective, no DOF/motion: cornell camera)
    px = (pix % xres).astype(np.float64)
    py = (pix // xres).astype(np.float64)
    ufx, ufy = sample_2d(pix, samp, SLOT_FILM, seed)
    raster = np.stack([px + ufx, py + ufy, np.zeros(n)], -1)
    pcam = _xform_p(sc["raster2cam"], raster)
    d = _normalize(pcam)
    c2w = sc["cam2world"]
    o = np.tile(c2w[:3, 3], (n, 1))
    d = _normalize(d @ c2w[:3, :3].T)

    L = np.zeros((n, 3))
    thr = np.ones((n, 3))
    active = np.ones(n, bool)
    spec = np.ones(n, bool)
    pdf_prev = np.ones(n)
    emit = sc["light_emit"]
    kd_all = sc["mat_kd"]
    area_total = sc["light_area"]
    INV_PI = 1.0 / np.pi

    for b in range(max_depth + 1):
        t, prim, b1, b2 = tr.intersect(o, d, np.where(active, BIG, 0.0))
        miss = prim < 0
        active = active & ~miss
        sg = _shading_frame(tr, prim, o, d, t)
        kd = kd_all[sc["tri_mat"][np.maximum(prim, 0)]]
        wo_local = _to_local(sg, -d)

        # emitted at hit — path-vertex reuse: camera/specular vertices
        # unweighted, others MIS-weighted against the light strategy's
        # per-point solid-angle pdf (grail integrator.py path_reuse)
        li_row = sc["tri_light"][np.maximum(prim, 0)]
        facing = _dot(sg["ng"], -d) > 0.0
        cos_at = _dot(sg["ng"], -d)
        lp = (t * t) / np.maximum(np.abs(cos_at) * area_total, 1e-12)
        on_light = li_row >= 0
        w_em = np.where(spec | ~on_light, 1.0, power_heuristic(pdf_prev, lp))
        add = active & on_light & facing
        L += np.where(add[:, None], thr * emit * w_em[:, None], 0.0)

        # ---- estimate_direct (one light, pmf=1)
        u1, u2 = sample_2d(pix, samp, _bdim(b, D_LIGHT_POS), seed)
        u3 = sample_1d(pix, samp, _bdim(b, D_LIGHT_TRI), seed)
        # area sample: float32 CDF counting search (mc.batched_searchsorted)
        cdf = sc["light_cdf"]
        cnt = np.sum(cdf[None, 1:-1] <= np.float32(u3)[:, None], axis=1)
        slot = np.clip(cnt, 0, len(cdf) - 2)
        ltri = sc["light_tris"][slot]
        su1 = np.sqrt(u1)
        lb0, lb1 = 1.0 - su1, u2 * su1
        lv0 = tr.v0[ltri]
        pl = lv0 + lb1[:, None] * tr.e1[ltri] \
            + (1.0 - lb0 - lb1)[:, None] * tr.e2[ltri]
        n_l = tr.ng[ltri]
        vec = pl - sg["p"]
        dist2 = np.maximum(np.sum(vec * vec, -1), 1e-20)
        dist = np.sqrt(dist2)
        wi = vec / dist[:, None]
        cos_at_l = _dot(n_l, -wi)
        pdf_l = dist2 / np.maximum(np.abs(cos_at_l) * area_total, 1e-12)
        rad = np.where((cos_at_l > 0.0)[:, None], emit[None], 0.0)
        ldist = dist * (1.0 - 1e-3)

        wi_local = _to_local(sg, wi)
        reflect = wo_local[:, 2] * wi_local[:, 2] > 0.0
        f_l = np.where(reflect[:, None], kd * INV_PI, 0.0)
        cos_l = np.abs(_dot(wi, sg["ns"]))
        cp = (active & (pdf_l > 0.0) & (cos_l > 0.0)
              & np.any(rad > 0.0, -1) & np.any(f_l > 0.0, -1))
        occ = tr.occluded(sg["p"] + wi * sg["eps"][:, None], wi,
                          np.where(cp, ldist - 2.0 * sg["eps"], 0.0))
        bsdf_pdf_l = np.where(reflect, np.abs(wi_local[:, 2]) * INV_PI, 0.0)
        w_l = power_heuristic(pdf_l, bsdf_pdf_l)
        Ld = np.where((cp & ~occ)[:, None],
                      f_l * rad * (cos_l * w_l
                                   / np.maximum(pdf_l, 1e-12))[:, None], 0.0)

        L += np.where(active[:, None], thr * Ld, 0.0)

        # ---- continuation (cosine sample; matte: never specular). The MIS
        # BSDF strategy is covered by REUSING this ray: the next bounce's
        # emission term carries the power-heuristic weight via pdf_prev.
        sign = np.where(wo_local[:, 2] > 0.0, 1.0, -1.0)
        uc1, uc2 = sample_2d(pix, samp, _bdim(b, D_BSDF_DIR), seed)
        wi_c = cosine_sample_hemisphere(uc1, uc2)
        wi_c = wi_c * np.stack([np.ones(n), np.ones(n), sign], -1)
        f_c = kd * INV_PI
        pdf_c = np.abs(wi_c[:, 2]) * INV_PI
        wi_w = _to_world(sg, wi_c)
        cos_c = np.abs(_dot(wi_w, sg["ns"]))
        contrib = f_c * (cos_c / np.maximum(pdf_c, 1e-12))[:, None]
        cont_ok = (pdf_c > 0.0) & np.any(f_c != 0.0, -1)
        thr = np.where(cont_ok[:, None], thr * contrib, thr)
        active = active & cont_ok
        spec = np.zeros(n, bool)
        pdf_prev = np.abs(wi_c[:, 2]) * INV_PI   # non-specular avg pdf

        # ---- Russian roulette
        q = np.where(b >= rr_depth, np.minimum(0.5, luminance(thr)), 1.0)
        u_rr = sample_1d(pix, samp, _bdim(b, D_RR), seed)
        active = active & (u_rr < q)
        thr = thr / np.maximum(q, 1e-6)[:, None]

        o = sg["p"] + wi_w * sg["eps"][:, None]
        d = wi_w

    return L
