"""SceneBuilder → (scene pytree, SceneMeta): the TPU replacement for pbrt's object
graph (api.cpp RenderOptions/MakeScene).

pbrt builds a pointer graph of Shapes/Materials/Lights; here everything compiles to
structure-of-arrays device buffers: one global triangle soup (world-space verts,
indices, per-tri material/light ids, flag bits), a material lobe table, a texture
table (static specs + differentiable row data), a light table with per-light area
CDFs, and the camera pack. SceneMeta holds every static (hashable) fact so the
render function jits cleanly with scene data as traced pytree leaves.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import transform as tr
from ..shade import bsdf as bx
from ..shade import lights as lt
from ..shade import geometry as geom
from ..shade.textures import TexSpec
from ..shade.materials import CONV_ID
from ..core.rng import SamplerConfig
from ..engine.filters import FilterConfig


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static scene facts (safe as jit static arg)."""
    tex_specs: Tuple[TexSpec, ...]
    lobe_types: Tuple[int, ...]
    light_types: Tuple[int, ...]
    n_lights: int
    n_tris: int
    sampler: SamplerConfig
    cam_kind: int
    filter: FilterConfig
    xres: int
    yres: int
    has_env_map: bool = False
    n_images: int = 0
    media_kinds: Tuple[int, ...] = ()
    has_bump: bool = False
    bump_rows: Tuple[int, ...] = ()
    light_image_rows: Tuple[Tuple[int, int], ...] = ()   # (light_row, image_id)
    alpha_rows: Tuple[int, ...] = ()    # alpha-cutout texture rows in use
    crop: Tuple[float, float, float, float] = (0.0, 1.0, 0.0, 1.0)
    # static per-material lobe stacks for material-sorted megabatch shading
    # (SURVEY §2.5 TPU-equiv: shade queue partitioned by material type, each
    # type's kernel specialized over its segment). Per material: a tuple of
    # per-slot tuples (lobe_type, fr, s0, s1, s2, f0, f1, f2, f0_conv,
    # f1_conv) — the SAME ints as the scene["materials"] device table rows.
    mat_specs: Tuple[Tuple[Tuple[int, ...], ...], ...] = ()


def _motion_bounds(m0, m1, omin, omax, steps=16):
    """Conservative world AABB of an object box under an animated transform —
    pbrt AnimatedTransform::MotionBounds (union of interpolated-step bounds)."""
    corners = np.asarray([[omin[0] if i & 1 else omax[0],
                           omin[1] if i & 2 else omax[1],
                           omin[2] if i & 4 else omax[2]] for i in range(8)],
                         np.float32)
    m0 = np.asarray(m0, np.float32)
    m1 = np.asarray(m1, np.float32)
    if np.allclose(m0, m1):
        w = tr.xform_p_np(m0, corners)
        lo, hi = w.min(0), w.max(0)
    else:
        t0, q0, s0 = tr.decompose(m0)
        t1, q1, s1 = tr.decompose(m1)
        q0 = np.asarray(q0, np.float64)
        q1 = np.asarray(q1, np.float64)
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for k in range(steps):
            u = k / (steps - 1.0)
            T = (1 - u) * t0 + u * t1
            S = (1 - u) * s0 + u * s1
            d = float(np.dot(q0, q1))
            qb = -q1 if d < 0 else q1
            d = abs(d)
            if d > 0.9995:
                q = (1 - u) * q0 + u * qb
            else:
                th = np.arccos(np.clip(d, -1.0, 1.0))
                q = (np.sin((1 - u) * th) * q0 + np.sin(u * th) * qb) \
                    / np.sin(th)
            q = q / np.linalg.norm(q)
            x, y, z, w_ = q
            R = np.asarray([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w_), 2 * (x * z + y * w_)],
                [2 * (x * y + z * w_), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w_)],
                [2 * (x * z - y * w_), 2 * (y * z + x * w_), 1 - 2 * (x * x + y * y)]])
            M = R @ S
            w = corners @ M.T + T
            lo = np.minimum(lo, w.min(0))
            hi = np.maximum(hi, w.max(0))
    pad = 1e-4 * (np.linalg.norm(hi - lo) + 1.0)
    return (lo - pad).astype(np.float32), (hi + pad).astype(np.float32)


class SceneBuilder:
    def __init__(self):
        self.verts = []
        self.vnorm = []
        self.vuv = []
        self.tri_idx = []
        self.tri_mat = []
        self.tri_light = []
        self.tri_flags = []
        self.tri_alpha = []
        self.n_verts = 0
        self.tex_specs = []
        self.tex_const = []
        self.tex_w2t = []
        self.images = []
        self.mat_rows = []       # list of list-of-lobe dicts
        self.mat_bump = []       # per-material bump float-texture id (-1 none)
        self.lights = []         # list of dicts
        self.camera = None
        self.sampler = SamplerConfig()
        self.crop = (0.0, 1.0, 0.0, 1.0)   # film crop window [x0,x1,y0,y1]
        self.filter = FilterConfig()
        self.xres = 256
        self.yres = 256
        self.env_map = None      # (H,W,3) np array or None
        self.brdf_tables = []    # measured half-angle BRDF tables (np arrays)
        self.env_row = -1
        self.use_bvh = None      # None = auto (n_tris > 64), True/False forced
        self.media_regions = []  # list of dicts (add_volume)
        self.inst_objects = []   # object-space mesh buckets (ObjectBegin/End)
        self.instances = []      # {obj, m0, m1} (ObjectInstance / animated shapes)
        self.density_grids = []

    # ------------------------------------------------------------------- textures
    def add_texture(self, spec: TexSpec, const=(0.0, 0.0, 0.0), w2t=None):
        self.tex_specs.append(spec)
        self.tex_const.append(np.asarray(const, np.float32))
        self.tex_w2t.append(np.asarray(w2t if w2t is not None else tr.identity(),
                                       np.float32))
        return len(self.tex_specs) - 1

    def const_tex(self, value):
        """Constant texture row; scalar or rgb."""
        v = np.asarray(value, np.float32).reshape(-1)
        if v.size == 1:
            v = np.repeat(v, 3)
        return self.add_texture(TexSpec(kind="const"), v)

    def add_image(self, img):
        self.images.append(np.asarray(img, np.float32))
        return len(self.images) - 1

    # ------------------------------------------------------------------ materials
    def add_material(self, lobes, bump=None):
        """lobes: list of dicts with keys type, fr, s0, s1, s2, f0, f1, f2,
        f0_conv, f1_conv (texture ids for s*/f*; missing keys defaulted).
        bump: optional float-texture id for Material::Bump displacement."""
        self.mat_rows.append(list(lobes))
        self.mat_bump.append(-1 if bump is None else int(bump))
        return len(self.mat_rows) - 1

    def add_measured_material(self, table):
        """Measured BRDF material (measured.cpp): half-angle table lookup
        lobe, cosine-sampled; table from shade/measured.py loaders."""
        from ..shade import bsdf as bx
        from ..shade.measured import albedo_estimate
        gi = len(self.brdf_tables)
        self.brdf_tables.append(np.asarray(table, np.float32))
        one = self.const_tex((1.0, 1.0, 1.0))
        alb = self.const_tex(tuple(np.clip(albedo_estimate(table), 0.0, 1.0)))
        gid = self.add_texture(TexSpec(kind="const"), (float(gi),) * 3)
        return self.add_material([
            {"type": bx.MEASURED, "s0": one, "s1": alb, "f1": gid}])

    def matte(self, kd_tex=None, kd=(0.5, 0.5, 0.5), sigma_tex=None):
        """pbrt matte.cpp: Lambertian or OrenNayar."""
        if kd_tex is None:
            kd_tex = self.const_tex(kd)
        if sigma_tex is None:
            return self.add_material([{"type": bx.LAMBERT, "s0": kd_tex}])
        from ..shade.materials import CONV_RADIANS
        return self.add_material([{"type": bx.OREN_NAYAR, "s0": kd_tex,
                                   "f0": sigma_tex, "f0_conv": CONV_RADIANS}])

    # -------------------------------------------------------------------- geometry
    def add_mesh(self, verts, idx, material, normals=None, uvs=None,
                 reverse_orientation=False, swaps_handedness=False,
                 area_light_emit=None, n_samples=1, alpha_tex=-1):
        """Append a world-space triangle mesh (pbrtShape trianglemesh analog).

        If area_light_emit is given, every triangle becomes part of one
        DiffuseAreaLight (api.cpp pbrtAreaLightSource + pbrtShape)."""
        verts = np.asarray(verts, np.float32).reshape(-1, 3)
        idx = np.asarray(idx, np.int64).reshape(-1, 3)
        nv = verts.shape[0]
        ntri = idx.shape[0]
        base = self.n_verts
        flags = 0
        if normals is not None:
            flags |= geom.HAS_NS
        if uvs is not None:
            flags |= geom.HAS_UV
        if reverse_orientation:
            flags |= geom.REVERSE_ORIENTATION
        if swaps_handedness:
            flags |= geom.XFORM_SWAPS_HANDEDNESS

        self.verts.append(verts)
        self.vnorm.append(np.asarray(normals, np.float32).reshape(-1, 3)
                          if normals is not None else np.zeros((nv, 3), np.float32))
        self.vuv.append(np.asarray(uvs, np.float32).reshape(-1, 2)
                        if uvs is not None else np.zeros((nv, 2), np.float32))
        self.n_verts += nv

        light_id = -1
        if area_light_emit is not None:
            light_id = len(self.lights)
            tri_ids = list(range(sum(len(t) for t in self.tri_idx),
                                 sum(len(t) for t in self.tri_idx) + ntri))
            # triangle areas for the CDF
            v0 = verts[idx[:, 0]]
            v1 = verts[idx[:, 1]]
            v2 = verts[idx[:, 2]]
            areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
            self.lights.append({
                "type": lt.AREA,
                "emit": np.asarray(area_light_emit, np.float32),
                "l2w": tr.identity(),
                "tris": tri_ids, "tri_areas": areas,
                "n_samples": n_samples,
            })

        self.tri_idx.append(idx + base)
        self.tri_mat.append(np.full(ntri, material, np.int64))
        self.tri_light.append(np.full(ntri, light_id, np.int64))
        self.tri_flags.append(np.full(ntri, flags, np.int64))
        self.tri_alpha.append(np.full(ntri, alpha_tex, np.int64))
        return light_id

    # ------------------------------------------------------------------- instances
    def add_object(self):
        """Open a reusable object-space geometry bucket (pbrtObjectBegin).
        Returns the object id for add_object_mesh/add_instance."""
        self.inst_objects.append({
            "verts": [], "vnorm": [], "vuv": [], "tri_idx": [],
            "tri_mat": [], "tri_flags": [], "tri_alpha": [], "n_verts": 0})
        return len(self.inst_objects) - 1

    def add_object_mesh(self, obj_id, verts, idx, material, normals=None,
                        uvs=None, reverse_orientation=False,
                        swaps_handedness=False, alpha_tex=-1):
        """Append an OBJECT-SPACE mesh to an instancing bucket. Geometry is
        stored once regardless of instance count (pbrt TransformedPrimitive;
        area lights inside objects are unsupported, as in the reference)."""
        ob = self.inst_objects[obj_id]
        verts = np.asarray(verts, np.float32).reshape(-1, 3)
        idx = np.asarray(idx, np.int64).reshape(-1, 3)
        nv = verts.shape[0]
        ntri = idx.shape[0]
        flags = 0
        if normals is not None:
            flags |= geom.HAS_NS
        if uvs is not None:
            flags |= geom.HAS_UV
        if reverse_orientation:
            flags |= geom.REVERSE_ORIENTATION
        if swaps_handedness:
            flags |= geom.XFORM_SWAPS_HANDEDNESS
        ob["tri_alpha"].append(np.full(ntri, alpha_tex, np.int64))
        ob["verts"].append(verts)
        ob["vnorm"].append(np.asarray(normals, np.float32).reshape(-1, 3)
                           if normals is not None
                           else np.zeros((nv, 3), np.float32))
        ob["vuv"].append(np.asarray(uvs, np.float32).reshape(-1, 2)
                         if uvs is not None else np.zeros((nv, 2), np.float32))
        ob["tri_idx"].append(idx + ob["n_verts"])
        ob["tri_mat"].append(np.full(ntri, material, np.int64))
        ob["tri_flags"].append(np.full(ntri, flags, np.int64))
        ob["n_verts"] += nv

    def add_instance(self, obj_id, m0, m1=None):
        """Instantiate an object with a (possibly animated) object-to-world
        transform pair (pbrtObjectInstance → TransformedPrimitive)."""
        m0 = np.asarray(m0, np.float32)
        m1 = m0 if m1 is None else np.asarray(m1, np.float32)
        self.instances.append({"obj": obj_id, "m0": m0, "m1": m1})

    # ---------------------------------------------------------------------- lights
    def add_point_light(self, p, intensity):
        m = tr.translate(np.asarray(p, np.float64))
        self.lights.append({"type": lt.POINT, "emit": np.asarray(intensity, np.float32),
                            "l2w": m})

    def add_spot_light(self, l2w, intensity, cone_angle=30.0, cone_delta=5.0):
        self.lights.append({
            "type": lt.SPOT, "emit": np.asarray(intensity, np.float32), "l2w": l2w,
            "cos_total": np.cos(np.radians(cone_angle)),
            "cos_falloff": np.cos(np.radians(cone_angle - cone_delta))})

    def add_projection_light(self, l2w, intensity, fov=45.0, image_id=-1):
        """pbrt projection.cpp: intensity projected through a perspective
        frustum along the light's +z; image_id indexes builder images."""
        aspect = 1.0
        if image_id >= 0:
            im = self.images[image_id]
            aspect = im.shape[1] / im.shape[0]
        if aspect > 1.0:
            screen = (-aspect, aspect, -1.0, 1.0)
        else:
            screen = (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)
        self.lights.append({
            "type": lt.PROJECTION, "emit": np.asarray(intensity, np.float32),
            "l2w": l2w, "proj": tr.perspective(fov, 1e-3, 1e30),
            "proj_hither": 1e-3, "screen": np.asarray(screen, np.float32),
            "image_id": int(image_id)})

    def add_goniometric_light(self, l2w, intensity, image_id=-1):
        """pbrt goniometric.cpp: point intensity modulated by a lat-long map."""
        self.lights.append({
            "type": lt.GONIOMETRIC, "emit": np.asarray(intensity, np.float32),
            "l2w": l2w, "image_id": int(image_id)})

    def add_distant_light(self, from_p, to_p, radiance):
        d = np.asarray(to_p, np.float64) - np.asarray(from_p, np.float64)
        d = d / np.linalg.norm(d)
        self.lights.append({"type": lt.DISTANT,
                            "emit": np.asarray(radiance, np.float32),
                            "l2w": tr.identity(),
                            "world_dir": (-d).astype(np.float32)})

    def add_infinite_light(self, l2w=None, radiance=(1.0, 1.0, 1.0), env_map=None):
        """InfiniteAreaLight; env_map (H,W,3) lat-long, importance = luminance·sinθ."""
        self.env_row = len(self.lights)
        self.lights.append({"type": lt.INFINITE,
                            "emit": np.asarray(radiance, np.float32),
                            "l2w": l2w if l2w is not None else tr.identity()})
        if env_map is not None:
            self.env_map = np.asarray(env_map, np.float32)

    # -------------------------------------------------------------------- volumes
    def add_volume(self, vtype, v2w=None, p0=(0, 0, 0), p1=(1, 1, 1),
                   sigma_a=(0.45, 0.45, 0.45), sigma_s=(0.25, 0.25, 0.25),
                   g=0.0, le=(0, 0, 0), density=None, exp_a=1.0, exp_b=1.0,
                   updir=(0, 1, 0)):
        """vtype: media.HOMOGENEOUS | GRID | EXPONENTIAL; box [p0,p1] in volume
        space, v2w the VolumeToWorld transform (pbrt src/volumes/*)."""
        grid_id = -1
        if density is not None:
            grid_id = len(self.density_grids)
            self.density_grids.append(np.asarray(density, np.float32))
        self.media_regions.append(dict(
            type=vtype, v2w=v2w if v2w is not None else tr.identity(),
            p0=np.asarray(p0, np.float32), p1=np.asarray(p1, np.float32),
            sigma_a=np.asarray(sigma_a, np.float32),
            sigma_s=np.asarray(sigma_s, np.float32),
            g=float(g), le=np.asarray(le, np.float32), grid_id=grid_id,
            exp_a=float(exp_a), exp_b=float(exp_b),
            updir=np.asarray(updir, np.float32)))

    # --------------------------------------------------------------------- finalize
    def finalize(self):
        has_sentinel = False
        if self.instances and sum(len(t) for t in self.tri_idx) == 0:
            # instanced-only scene: every intersect path still wants base
            # geometry; park one far-away micro-triangle (never hit). It is
            # excluded from world bounds below — including it overflows
            # norm(wmax-wmin) to inf, poisoning power-strategy light CDFs.
            has_sentinel = True
            far = 1.0e30
            self.add_mesh(np.asarray([[far, far, far], [far, far + 1, far],
                                      [far, far, far + 1]], np.float32),
                          np.asarray([[0, 1, 2]], np.int64), 0)
        n_tris = sum(len(t) for t in self.tri_idx)   # base (non-instanced)
        if n_tris == 0:
            raise ValueError("scene has no geometry")
        verts = np.concatenate(self.verts) if self.verts else np.zeros((0, 3), np.float32)
        vnorm = np.concatenate(self.vnorm)
        vuv = np.concatenate(self.vuv)
        tri_idx = np.concatenate(self.tri_idx)
        tri_mat = np.concatenate(self.tri_mat)
        tri_light = np.concatenate(self.tri_light)
        tri_flags = np.concatenate(self.tri_flags)
        tri_alpha = np.concatenate(self.tri_alpha)
        base_verts = verts

        # ---- instanced objects: object-space geometry appended ONCE after
        # the base soup (global tri ids >= n_tris); per-tri tables extend so
        # every downstream gather (mat/light/flags/alpha) works unchanged
        inst_meta = None
        if self.instances:
            obj_tri_ranges = []
            for ob in self.inst_objects:
                if not ob["tri_idx"]:
                    obj_tri_ranges.append((len(tri_idx), len(tri_idx)))
                    continue
                ov = np.concatenate(ob["verts"])
                t0 = len(tri_idx)
                tri_idx = np.concatenate(
                    [tri_idx, np.concatenate(ob["tri_idx"]) + len(verts)])
                verts = np.concatenate([verts, ov])
                vnorm = np.concatenate([vnorm, np.concatenate(ob["vnorm"])])
                vuv = np.concatenate([vuv, np.concatenate(ob["vuv"])])
                tri_mat = np.concatenate([tri_mat, np.concatenate(ob["tri_mat"])])
                tri_flags = np.concatenate(
                    [tri_flags, np.concatenate(ob["tri_flags"])])
                nt = len(tri_idx) - t0
                tri_light = np.concatenate([tri_light, np.full(nt, -1, np.int64)])
                # instanced shapes keep their alpha-cutout texture (pbrt
                # TransformedPrimitive::Intersect defers to the inner shape)
                tri_alpha = np.concatenate(
                    [tri_alpha, np.concatenate(ob["tri_alpha"])])
                obj_tri_ranges.append((t0, len(tri_idx)))
            inst_meta = obj_tri_ranges

        scene = {
            "verts": jnp.asarray(verts),
            "vnorm": jnp.asarray(vnorm),
            "vuv": jnp.asarray(vuv),
            "tri_idx": jnp.asarray(tri_idx.astype(np.int32)),
            "tri_mat": jnp.asarray(tri_mat.astype(np.int32)),
            "tri_light": jnp.asarray(tri_light.astype(np.int32)),
            "tri_flags": jnp.asarray(tri_flags.astype(np.int32)),
            "tri_alpha": jnp.asarray(tri_alpha.astype(np.int32)),
        }

        # world bound/radius (Scene::WorldBound): base world verts ∪ instance
        # motion bounds (object verts are object-space — excluded directly)
        if has_sentinel:
            wmin = np.full(3, np.inf, np.float32)
            wmax = np.full(3, -np.inf, np.float32)
        else:
            wmin, wmax = base_verts.min(0), base_verts.max(0)
        if self.instances:
            for ins in self.instances:
                ob = self.inst_objects[ins["obj"]]
                if not ob["verts"]:
                    continue
                ov = np.concatenate(ob["verts"])
                omin, omax = ov.min(0), ov.max(0)
                imin, imax = _motion_bounds(ins["m0"], ins["m1"], omin, omax)
                wmin = np.minimum(wmin, imin)
                wmax = np.maximum(wmax, imax)
        if not np.all(np.isfinite(wmax - wmin)):   # only empty inst objects
            wmin, wmax = base_verts.min(0), base_verts.max(0)
        scene["world_radius"] = jnp.float32(0.5 * np.linalg.norm(wmax - wmin) + 1e-3)

        # ---- materials table
        K = max((len(r) for r in self.mat_rows), default=1)
        K = max(K, 1)
        M = max(len(self.mat_rows), 1)
        zero_tex = 0 if self.tex_specs else self.const_tex((0.0, 0.0, 0.0))
        fields = {f: np.zeros((M, K), np.int32) for f in
                  ("lobe_type", "fr", "s0", "s1", "s2", "f0", "f1", "f2",
                   "f0_conv", "f1_conv")}
        mat_specs = []
        for mi, row in enumerate(self.mat_rows):
            slots = []
            for ki, lobe in enumerate(row):
                fields["lobe_type"][mi, ki] = lobe.get("type", bx.NONE)
                fields["fr"][mi, ki] = lobe.get("fr", bx.FR_NOOP)
                for slot in ("s0", "s1", "s2", "f0", "f1", "f2"):
                    fields[slot][mi, ki] = lobe.get(slot, zero_tex)
                fields["f0_conv"][mi, ki] = lobe.get("f0_conv", CONV_ID)
                fields["f1_conv"][mi, ki] = lobe.get("f1_conv", CONV_ID)
                slots.append(tuple(int(fields[f][mi, ki]) for f in
                                   ("lobe_type", "fr", "s0", "s1", "s2",
                                    "f0", "f1", "f2", "f0_conv", "f1_conv")))
            mat_specs.append(tuple(slots))
        scene["materials"] = {k: jnp.asarray(v) for k, v in fields.items()}
        bump_arr = np.full(M, -1, np.int32)
        for mi, bt in enumerate(self.mat_bump):
            bump_arr[mi] = bt
        scene["materials"]["bump"] = jnp.asarray(bump_arr)
        lobe_types = tuple(sorted({int(t) for r in self.mat_rows
                                   for t in (l.get("type", bx.NONE) for l in r)}
                                  - {bx.NONE}))

        # ---- texture table
        scene["tex_data"] = {
            "const": jnp.asarray(np.stack(self.tex_const)) if self.tex_const
                     else jnp.zeros((1, 3), jnp.float32),
            "w2t": jnp.asarray(np.stack(self.tex_w2t)) if self.tex_w2t
                   else jnp.zeros((1, 4, 4), jnp.float32),
        }
        scene["images"] = tuple(jnp.asarray(im) for im in self.images)
        # mip pyramids (MIPMap, mipmap.h): host-side pow2 resample + levels
        from ..shade.mipmap import build_pyramid, pack_pyramid
        scene["mipmaps"] = tuple(
            pack_pyramid(build_pyramid(im))
            for im in self.images)

        # ---- light table
        L = max(len(self.lights), 1)
        at_max = max((len(l.get("tris", [])) for l in self.lights), default=0)
        at_max = max(at_max, 1)
        larr = {
            "type": np.zeros(L, np.int32),
            "emit": np.zeros((L, 3), np.float32),
            "l2w": np.tile(tr.identity(), (L, 1, 1)),
            "w2l": np.tile(tr.identity(), (L, 1, 1)),
            "cos_total": np.zeros(L, np.float32),
            "cos_falloff": np.zeros(L, np.float32),
            "world_dir": np.zeros((L, 3), np.float32),
            "area": np.ones(L, np.float32),
            "atri": np.zeros((L, at_max), np.int32),
            # pre-gathered light-triangle geometry: area-light sampling reads
            # these instead of the global mesh (same values bitwise), which
            # keeps Sample_L independent of the big vertex arrays — required
            # by the P6 scene-sharded (ring) mode where no device holds the
            # whole mesh, and a cheap win everywhere else (3 flat gathers of
            # a tiny table instead of 4 into mesh-sized ones)
            "av0": np.zeros((L, at_max, 3), np.float32),
            "av1": np.zeros((L, at_max, 3), np.float32),
            "av2": np.zeros((L, at_max, 3), np.float32),
            "aflip": np.zeros((L, at_max), np.int32),
            "acdf": np.tile(np.linspace(0, 1, at_max + 1, dtype=np.float32), (L, 1)),
            "n_samples": np.ones(L, np.int32),
            "proj": np.tile(tr.identity(), (L, 1, 1)),
            "proj_hither": np.full(L, 1e-3, np.float32),
            "screen": np.tile(np.asarray([-1, 1, -1, 1], np.float32), (L, 1)),
            "image_row": np.full(L, -1, np.int32),
        }
        light_image_rows = {}
        for i, l in enumerate(self.lights):
            larr["type"][i] = l["type"]
            larr["emit"][i] = l["emit"]
            larr["l2w"][i] = np.asarray(l["l2w"], np.float32)
            larr["w2l"][i] = tr.inverse(l["l2w"])
            larr["cos_total"][i] = l.get("cos_total", 0.0)
            larr["cos_falloff"][i] = l.get("cos_falloff", 0.0)
            larr["world_dir"][i] = l.get("world_dir", (0, 0, 1))
            if l["type"] == lt.AREA:
                tris = l["tris"]
                areas = l["tri_areas"]
                total = float(areas.sum())
                larr["area"][i] = total
                larr["atri"][i, :len(tris)] = tris
                tarr = np.asarray(tris, np.int64)
                i0 = tri_idx[tarr]
                larr["av0"][i, :len(tris)] = verts[i0[:, 0]]
                larr["av1"][i, :len(tris)] = verts[i0[:, 1]]
                larr["av2"][i, :len(tris)] = verts[i0[:, 2]]
                fl = tri_flags[tarr]
                larr["aflip"][i, :len(tris)] = (
                    ((fl & geom.REVERSE_ORIENTATION) != 0)
                    ^ ((fl & geom.XFORM_SWAPS_HANDEDNESS) != 0)).astype(np.int32)
                cdf = np.concatenate([[0.0], np.cumsum(areas) / max(total, 1e-12)])
                larr["acdf"][i, :len(cdf)] = cdf.astype(np.float32)
                larr["acdf"][i, len(cdf):] = 1.0
            larr["n_samples"][i] = l.get("n_samples", 1)
            if "proj" in l:
                larr["proj"][i] = np.asarray(l["proj"], np.float32)
                larr["proj_hither"][i] = l["proj_hither"]
                larr["screen"][i] = l["screen"]
            if l.get("image_id", -1) >= 0:
                larr["image_row"][i] = i
                light_image_rows[i] = l["image_id"]
        scene["lights"] = {k: jnp.asarray(v) for k, v in larr.items()}
        scene["env_row"] = jnp.int32(max(self.env_row, 0))
        scene["env_map"] = (jnp.asarray(self.env_map)
                            if self.env_map is not None else None)
        scene["brdf_tables"] = tuple(jnp.asarray(t) for t in self.brdf_tables)

        # env importance map: luminance · sinθ (infinite.cpp ctor)
        if self.env_row >= 0:
            from ..core import montecarlo as mc
            if self.env_map is not None:
                lum = (0.212671 * self.env_map[..., 0]
                       + 0.715160 * self.env_map[..., 1]
                       + 0.072169 * self.env_map[..., 2])
            else:
                lum = np.ones((64, 128), np.float32)
            h = lum.shape[0]
            sint = np.sin((np.arange(h) + 0.5) / h * np.pi)
            scene["env_dist"] = mc.build_distribution_2d(
                jnp.asarray(lum * sint[:, None] + 1e-9))
        else:
            from ..core import montecarlo as mc
            scene["env_dist"] = mc.build_distribution_2d(jnp.ones((2, 2), jnp.float32))

        # power-weighted light distribution (ComputeLightSamplingCDF)
        from ..core import montecarlo as mc
        from ..shade.lights import light_power
        scene["light_power_dist"] = mc.build_distribution_1d(light_power(scene))

        if self.camera is None:
            raise ValueError("scene has no camera")
        scene["camera"] = {
            k: (jnp.asarray(v) if not isinstance(v, dict)
                else {kk: jnp.asarray(vv) for kk, vv in v.items()})
            for k, v in self.camera.items()}

        # ---- participating media
        if self.media_regions:
            mr = self.media_regions
            nv = len(mr)
            scene["media"] = {
                "type": jnp.asarray([m["type"] for m in mr], jnp.int32),
                "v2w": jnp.asarray(np.stack([m["v2w"] for m in mr])),
                "w2v": jnp.asarray(np.stack([tr.inverse(m["v2w"]) for m in mr])),
                "bounds_min": jnp.asarray(np.stack([m["p0"] for m in mr])),
                "bounds_max": jnp.asarray(np.stack([m["p1"] for m in mr])),
                "sigma_a": jnp.asarray(np.stack([m["sigma_a"] for m in mr])),
                "sigma_s": jnp.asarray(np.stack([m["sigma_s"] for m in mr])),
                "g": jnp.asarray([m["g"] for m in mr], jnp.float32),
                "le": jnp.asarray(np.stack([m["le"] for m in mr])),
                "grid_id": jnp.asarray([m["grid_id"] for m in mr], jnp.int32),
                "exp_a": jnp.asarray([m["exp_a"] for m in mr], jnp.float32),
                "exp_b": jnp.asarray([m["exp_b"] for m in mr], jnp.float32),
                "updir": jnp.asarray(np.stack([m["updir"] for m in mr])),
            }
            scene["density_grids"] = tuple(jnp.asarray(g)
                                           for g in self.density_grids)
        else:
            scene["media"] = None
            scene["density_grids"] = ()

        use_bvh = self.use_bvh if self.use_bvh is not None else n_tris > 64
        # instanced scenes always use the BVH dispatch: the brute kernels walk
        # the WHOLE merged tri table, which now contains object-space rows
        use_bvh = use_bvh or bool(self.instances)
        if use_bvh:
            from .bvh import build_bvh_auto as build_bvh, bvh_to_device
            from ..kernels.bvh_stream import (build_stream_table,
                                              build_clustered_stream,
                                              VMEM_TABLE_BUDGET,
                                              CLUSTER_TARGET_TRIS)
            tri_base = np.concatenate(self.tri_idx)   # base tris only
            # force_leaf=4: the streaming kernel pays the same for a box step
            # as a tri step, so SAH's split-to-1 (single-ray cost model) loses
            b_np = build_bvh(verts, tri_base, max_prims=4, force_leaf=4)
            scene["bvh"] = bvh_to_device(b_np)
            n_rec = int((b_np["nprims"] == 0).sum()) + len(tri_base)
            stream_bytes = -(-n_rec // 8) * 128 * 4
            if stream_bytes < VMEM_TABLE_BUDGET:
                scene["bvh"]["stream"] = jnp.asarray(
                    build_stream_table(b_np, verts, tri_base))
            else:
                # beyond the VMEM wall: clustered tables, one launch per
                # spatial cluster (SURVEY §5.7 / BASELINE config 4)
                scene["bvh"]["cstream"] = jnp.asarray(build_clustered_stream(
                    verts, tri_base, build_bvh, CLUSTER_TARGET_TRIS))
        else:
            scene["bvh"] = None

        # ---- instance table + concatenated BLAS (TransformedPrimitive)
        if self.instances and any(ob["tri_idx"] for ob in self.inst_objects):
            from .bvh import build_bvh_auto as build_bvh
            from ..kernels.bvh_stream import (build_stream_records,
                                              pack_record_rows,
                                              VMEM_TABLE_BUDGET)
            blas = {k: [] for k in ("bounds_min", "bounds_max", "right",
                                    "prim_off", "nprims", "axis")}
            blas_prim_ids = []
            obj_root = []
            node_off = 0
            # per-object stream-record tables concatenated with offset
            # pointers: the instanced fast path traverses these through the
            # Pallas stream kernel with per-stream object-root starts
            # (kernels/instanced.py), replacing the jnp BLAS walk
            srecs = []
            obj_rec_root = []
            rec_base = 0
            for oi, (t0, t1) in enumerate(inst_meta):
                if t1 == t0:
                    obj_root.append(-1)
                    obj_rec_root.append(-1)
                    continue
                subset = np.arange(t0, t1)
                b = build_bvh(verts, tri_idx[t0:t1], max_prims=4, force_leaf=4)
                obj_root.append(node_off)
                blas["bounds_min"].append(b["bounds_min"])
                blas["bounds_max"].append(b["bounds_max"])
                r = b["right"].copy()
                r[r >= 0] += node_off
                blas["right"].append(r)
                blas["prim_off"].append(
                    b["prim_off"] + sum(len(p) for p in blas_prim_ids))
                blas["nprims"].append(b["nprims"])
                blas["axis"].append(b["axis"])
                blas_prim_ids.append(subset[b["prim_ids"]])
                node_off += len(b["bounds_min"])

                sub_idx = tri_idx[t0:t1]
                sv0 = verts[sub_idx[:, 0]]
                tris9 = np.concatenate(
                    [sv0, verts[sub_idx[:, 1]] - sv0,
                     verts[sub_idx[:, 2]] - sv0], axis=1).astype(np.float32)
                ordered = tris9[np.asarray(b["prim_ids"], np.int64)]
                recs = build_stream_records(b, ordered, prim_map=subset)
                is_tri_rec = (recs[:, 9].astype(np.int64) & 4) > 0
                recs[~is_tri_rec, 9] += rec_base * 8
                sk = recs[:, 10]
                recs[:, 10] = np.where(sk >= 0, sk + rec_base, sk)
                obj_rec_root.append(rec_base)
                rec_base += len(recs)
                srecs.append(recs)
            scene["inst"] = {
                "blas": {
                    **{k: jnp.asarray(np.concatenate(v))
                       for k, v in blas.items()},
                    "prim_ids": jnp.asarray(
                        np.concatenate(blas_prim_ids).astype(np.int32)),
                },
            }
            if srecs:
                all_recs = np.concatenate(srecs)
                stream_bytes = -(-len(all_recs) // 8) * 128 * 4
                if stream_bytes < VMEM_TABLE_BUDGET:
                    scene["inst"]["stream"] = jnp.asarray(
                        pack_record_rows(all_recs))
                    # per-OBJECT root records: instances of one object share
                    # a table root, so the sweep groups streams by object
                    scene["inst"]["obj_roots"] = jnp.asarray(
                        np.asarray(obj_rec_root, np.int32))
            inst_obj_rec_root = obj_rec_root
            self.instances = [i for i in self.instances
                              if obj_root[i["obj"]] >= 0]
            I = len(self.instances)
            pk = {"root": np.zeros(I, np.int32),
                  "sroot": np.full(I, -1, np.int32),
                  "obj": np.zeros(I, np.int32),
                  "t": np.zeros((I, 2, 3), np.float32),
                  "q": np.zeros((I, 2, 4), np.float32),
                  "s": np.zeros((I, 2, 3, 3), np.float32),
                  "anim": np.zeros(I, np.bool_),
                  "m0": np.zeros((I, 4, 4), np.float32),
                  "m0_inv": np.zeros((I, 4, 4), np.float32),
                  "swap": np.zeros(I, np.bool_),
                  "wmin": np.zeros((I, 3), np.float32),
                  "wmax": np.zeros((I, 3), np.float32)}
            for ii, ins in enumerate(self.instances):
                p = tr.animated_pack(ins["m0"], ins["m1"])
                pk["root"][ii] = obj_root[ins["obj"]]
                pk["sroot"][ii] = inst_obj_rec_root[ins["obj"]]
                pk["obj"][ii] = ins["obj"]
                pk["t"][ii] = p["t"]
                pk["q"][ii] = p["q"]
                pk["s"][ii] = p["s"]
                pk["anim"][ii] = p["animated"]
                pk["m0"][ii] = p["m0"]
                pk["m0_inv"][ii] = tr.inverse(ins["m0"])
                pk["swap"][ii] = bool(tr.swaps_handedness(ins["m0"]))
                ob = self.inst_objects[ins["obj"]]
                ov = np.concatenate(ob["verts"]) if ob["verts"] else \
                    np.zeros((1, 3), np.float32)
                pk["wmin"][ii], pk["wmax"][ii] = _motion_bounds(
                    ins["m0"], ins["m1"], ov.min(0), ov.max(0))
            scene["inst"].update({k: jnp.asarray(v) for k, v in pk.items()})
            if I == 0:
                scene["inst"] = None
        else:
            scene["inst"] = None

        light_types = tuple(sorted({int(l["type"]) for l in self.lights}))
        meta = SceneMeta(
            tex_specs=tuple(self.tex_specs),
            lobe_types=lobe_types,
            light_types=light_types,
            n_lights=len(self.lights),
            n_tris=n_tris,
            sampler=self.sampler,
            cam_kind=int(self.camera["type"]),
            filter=self.filter,
            xres=self.xres,
            yres=self.yres,
            has_env_map=self.env_map is not None,
            n_images=len(self.images),
            media_kinds=tuple(int(m["type"]) for m in self.media_regions),
            has_bump=any(bt >= 0 for bt in self.mat_bump),
            bump_rows=tuple(sorted({bt for bt in self.mat_bump if bt >= 0})),
            light_image_rows=tuple(sorted(light_image_rows.items())),
            alpha_rows=tuple(sorted(
                {int(a) for arr in self.tri_alpha
                 for a in np.unique(arr) if a >= 0}
                | {int(a) for ob in self.inst_objects
                   for arr in ob["tri_alpha"]
                   for a in np.unique(arr) if a >= 0})),
            crop=tuple(float(c) for c in self.crop),
            mat_specs=tuple(mat_specs),
        )
        return scene, meta
