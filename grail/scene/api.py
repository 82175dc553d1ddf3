"""Scene API — pbrt src/core/api.{h,cpp}: the procedural scene-building state
machine with graphics/transform state stacks and string-keyed factories.

Statement flow mirrors the reference exactly (pbrtInit → options block →
WorldBegin → attributes/shapes/lights → WorldEnd), but instead of building a
pointer graph it drives SceneBuilder, which compiles SoA device buffers.

Divergences (documented):
- Object instances are baked (geometry duplicated per instance transform) until
  the two-level TLAS lands; `ObjectInstance` of large meshes warns.
- Animated *shape* transforms take the shutter-open transform (camera motion
  blur is exact); animated-primitive motion blur arrives with the TLAS.
- Renderer "metropolis" maps to the batched PSS-MLT engine
  (engine/metropolis.py) with bidirectional path construction and optional
  direct-lighting separation (SURVEY §3.5).
"""
from __future__ import annotations

import copy
import logging
import os

import numpy as np

from ..core import transform as tr
from ..core.rng import SamplerConfig, RANDOM, STRATIFIED, ZERO_TWO, HALTON
from ..engine import camera as cam
from ..engine.filters import FilterConfig
from ..engine.integrator import IntegratorConfig
from ..shade import bsdf as bx
from ..shade.materials import CONV_ID, CONV_INV, CONV_RADIANS
from ..shade.textures import TexSpec
from .buffers import SceneBuilder
from .paramset import ParamSet, TextureParams
from . import shapes as shp

log = logging.getLogger("grail")

STATE_UNINITIALIZED, STATE_OPTIONS, STATE_WORLD = 0, 1, 2

# default conductor spectra (approx copper, pbrt metal.cpp defaults)
COPPER_ETA = (0.2004, 0.9240, 1.1022)
COPPER_K = (3.9129, 2.4528, 2.1421)


class GraphicsState:
    """pbrt api.cpp GraphicsState."""

    def __init__(self):
        self.material = "matte"
        self.material_params = ParamSet()
        self.named_materials = {}            # name -> material id (built)
        self.current_named_material = None
        self.float_textures = {}             # name -> tex id
        self.spectrum_textures = {}
        self.area_light = None               # (name, ParamSet)
        self.reverse_orientation = False
        self._material_id_cache = {}

    def clone(self):
        g = copy.copy(self)
        g.float_textures = dict(self.float_textures)
        g.spectrum_textures = dict(self.spectrum_textures)
        g.named_materials = dict(self.named_materials)
        g._material_id_cache = dict(self._material_id_cache)
        return g


class TransformSet:
    """Two transform slots for motion start/end (api.cpp TransformSet)."""

    def __init__(self):
        self.t = [tr.identity(), tr.identity()]

    def clone(self):
        ts = TransformSet()
        ts.t = [self.t[0].copy(), self.t[1].copy()]
        return ts

    def is_animated(self):
        return not np.allclose(self.t[0], self.t[1])


ALL_TRANSFORM_BITS = 0b11
START_BIT, END_BIT = 0b01, 0b10


class PbrtAPI:
    """One render context. Use via grail.scene.parser.parse_file or directly."""

    def __init__(self, options=None):
        self.state = STATE_OPTIONS
        self.ctm = TransformSet()
        self.active_bits = ALL_TRANSFORM_BITS
        self.coord_systems = {}
        self.gs = GraphicsState()
        self.pushed_gs = []
        self.pushed_ctm = []
        self.pushed_bits = []
        self.builder = SceneBuilder()
        self.options = options or {}
        # pre-world configuration (RenderOptions analog)
        self.camera_name = "perspective"
        self.camera_params = ParamSet()
        self.camera_to_world = TransformSet()
        self.sampler_name = "lowdiscrepancy"
        self.sampler_params = ParamSet()
        self.film_name = "image"
        self.film_params = ParamSet()
        self.filter_name = "box"
        self.filter_params = ParamSet()
        self.integrator_name = "directlighting"
        self.integrator_params = ParamSet()
        self.vol_integrator_name = "emission"
        self.vol_integrator_params = ParamSet()
        self.accelerator_name = "bvh"
        self.accelerator_params = ParamSet()
        self.renderer_name = "sampler"
        self.renderer_params = ParamSet()
        self.objects = {}                 # ObjectBegin name -> recorded shapes
        self._tlas_objects = {}           # name -> builder object id (BLAS)
        self.current_object = None
        self.search_path = "."
        self.volume_regions = []
        # BSSRDF medium for the dipole integrator (set by subsurface
        # materials; skin1 defaults as in pbrt volume.cpp's measured table)
        self.sss_sigma_a = (0.0011, 0.0024, 0.014)
        self.sss_sigma_s = (2.55, 3.21, 3.77)
        self.sss_eta = 1.3

    # --------------------------------------------------------------- CTM helpers
    def _for_active(self, fn):
        for i in range(2):
            if self.active_bits & (1 << i):
                self.ctm.t[i] = fn(self.ctm.t[i])

    def identity(self):
        self._for_active(lambda m: tr.identity())

    def translate(self, dx, dy, dz):
        self._for_active(lambda m: m @ tr.translate([dx, dy, dz]))

    def rotate(self, angle, x, y, z):
        self._for_active(lambda m: m @ tr.rotate(angle, [x, y, z]))

    def scale(self, sx, sy, sz):
        self._for_active(lambda m: m @ tr.scale(sx, sy, sz))

    def look_at(self, ex, ey, ez, lx, ly, lz, ux, uy, uz):
        # pbrt: CTM = CTM * Inverse(LookAt) — world→camera
        w2c = tr.inverse(tr.look_at([ex, ey, ez], [lx, ly, lz], [ux, uy, uz]))
        self._for_active(lambda m: m @ w2c)

    def concat_transform(self, m16):
        m = np.asarray(m16, np.float32).reshape(4, 4).T  # column-major input
        self._for_active(lambda cur: cur @ m)

    def transform(self, m16):
        m = np.asarray(m16, np.float32).reshape(4, 4).T
        self._for_active(lambda cur: m.copy())

    def coordinate_system(self, name):
        self.coord_systems[name] = self.ctm.clone()

    def coord_sys_transform(self, name):
        if name in self.coord_systems:
            self.ctm = self.coord_systems[name].clone()
        else:
            log.warning("CoordSysTransform: unknown coordinate system %r", name)

    def active_transform_all(self):
        self.active_bits = ALL_TRANSFORM_BITS

    def active_transform_start(self):
        self.active_bits = START_BIT

    def active_transform_end(self):
        self.active_bits = END_BIT

    def transform_times(self, start, end):
        self.transform_times_range = (start, end)

    # ----------------------------------------------------------- options block
    def camera(self, name, params):
        self.camera_name = name
        self.camera_params = params
        # camera-to-world = inverse(CTM); also save "camera" coord system
        c2w = TransformSet()
        c2w.t = [tr.inverse(self.ctm.t[0]), tr.inverse(self.ctm.t[1])]
        self.camera_to_world = c2w
        self.coord_systems["camera"] = c2w

    def sampler(self, name, params):
        self.sampler_name, self.sampler_params = name, params

    def film(self, name, params):
        self.film_name, self.film_params = name, params

    def pixel_filter(self, name, params):
        self.filter_name, self.filter_params = name, params

    def surface_integrator(self, name, params):
        self.integrator_name, self.integrator_params = name, params

    def volume_integrator(self, name, params):
        self.vol_integrator_name, self.vol_integrator_params = name, params

    def accelerator(self, name, params):
        self.accelerator_name, self.accelerator_params = name, params

    def renderer(self, name, params):
        self.renderer_name, self.renderer_params = name, params

    # -------------------------------------------------------------- world block
    def world_begin(self):
        self.state = STATE_WORLD
        self.ctm = TransformSet()
        self.active_bits = ALL_TRANSFORM_BITS
        self.coord_systems["world"] = self.ctm.clone()

    def attribute_begin(self):
        self.pushed_gs.append(self.gs.clone())
        self.pushed_ctm.append(self.ctm.clone())
        self.pushed_bits.append(self.active_bits)

    def attribute_end(self):
        if not self.pushed_gs:
            log.warning("Unmatched AttributeEnd")
            return
        self.gs = self.pushed_gs.pop()
        self.ctm = self.pushed_ctm.pop()
        self.active_bits = self.pushed_bits.pop()

    def transform_begin(self):
        self.pushed_ctm.append(self.ctm.clone())
        self.pushed_bits.append(self.active_bits)

    def transform_end(self):
        if not self.pushed_ctm:
            log.warning("Unmatched TransformEnd")
            return
        self.ctm = self.pushed_ctm.pop()
        self.active_bits = self.pushed_bits.pop()

    def reverse_orientation(self):
        self.gs.reverse_orientation = not self.gs.reverse_orientation

    # ---------------------------------------------------------------- textures
    def texture(self, name, ttype, texclass, params):
        tp = TextureParams(params, ParamSet(), self.gs.float_textures,
                           self.gs.spectrum_textures)
        tex_id = self._make_texture(texclass, tp)
        tp.report_unused(f'Texture "{texclass}"')
        if ttype == "float":
            self.gs.float_textures[name] = tex_id
        else:
            self.gs.spectrum_textures[name] = tex_id

    def _mapping_kwargs(self, tp):
        mapping = tp.find_one_string("mapping", "uv")
        kw = dict(
            mapping=mapping,
            su=tp.find_one_float("uscale", 1.0),
            sv=tp.find_one_float("vscale", 1.0),
            du=tp.find_one_float("udelta", 0.0),
            dv=tp.find_one_float("vdelta", 0.0),
        )
        if mapping == "planar":
            kw["v1"] = tuple(tp.geom.find_one_point("v1", (1, 0, 0)))
            kw["v2"] = tuple(tp.geom.find_one_point("v2", (0, 1, 0)))
        return kw

    def _make_texture(self, texclass, tp):
        b = self.builder
        w2t = tr.inverse(self.ctm.t[0])
        if texclass == "constant":
            return b.const_tex(tp.geom.find_one_rgb(
                "value", (tp.find_one_float("value", 1.0),) * 3))
        if texclass == "scale":
            t1 = tp.get_spectrum_texture(b, "tex1", (1, 1, 1))
            t2 = tp.get_spectrum_texture(b, "tex2", (1, 1, 1))
            return b.add_texture(TexSpec(kind="scale", inputs=(t1, t2)), w2t=w2t)
        if texclass == "mix":
            t1 = tp.get_spectrum_texture(b, "tex1", (0, 0, 0))
            t2 = tp.get_spectrum_texture(b, "tex2", (1, 1, 1))
            amt = tp.get_float_texture(b, "amount", 0.5)
            return b.add_texture(TexSpec(kind="mix", inputs=(t1, t2, amt)), w2t=w2t)
        if texclass == "bilerp":
            vs = [tp.get_spectrum_texture(b, k, (0, 0, 0))
                  for k in ("v00", "v01", "v10", "v11")]
            return b.add_texture(
                TexSpec(kind="bilerp", inputs=tuple(vs), **self._mapping_kwargs(tp)),
                w2t=w2t)
        if texclass == "uv":
            return b.add_texture(TexSpec(kind="uv", **self._mapping_kwargs(tp)),
                                 w2t=w2t)
        if texclass == "checkerboard":
            dim = tp.find_one_float("dimension", 2)
            t1 = tp.get_spectrum_texture(b, "tex1", (1, 1, 1))
            t2 = tp.get_spectrum_texture(b, "tex2", (0, 0, 0))
            aa = tp.find_one_string("aamode", "closedform")
            kw = self._mapping_kwargs(tp) if dim == 2 else {}
            return b.add_texture(
                TexSpec(kind="checkerboard", inputs=(t1, t2), dim=int(dim),
                        aa=aa, **kw), w2t=w2t)
        if texclass == "dots":
            t1 = tp.get_spectrum_texture(b, "inside", (1, 1, 1))
            t2 = tp.get_spectrum_texture(b, "outside", (0, 0, 0))
            return b.add_texture(
                TexSpec(kind="dots", inputs=(t1, t2), **self._mapping_kwargs(tp)),
                w2t=w2t)
        if texclass in ("fbm", "wrinkled"):
            return b.add_texture(
                TexSpec(kind=texclass,
                        octaves=tp.find_one_int("octaves", 8),
                        omega=tp.find_one_float("roughness", 0.5)), w2t=w2t)
        if texclass == "windy":
            return b.add_texture(TexSpec(kind="windy"), w2t=w2t)
        if texclass == "marble":
            return b.add_texture(
                TexSpec(kind="marble",
                        octaves=tp.find_one_int("octaves", 8),
                        omega=tp.find_one_float("roughness", 0.5),
                        scale=tp.find_one_float("scale", 1.0),
                        variation=tp.find_one_float("variation", 0.2)), w2t=w2t)
        if texclass == "imagemap":
            from ..engine.imageio import read_image
            fname = self._resolve(tp.find_one_string("filename", ""))
            scale = tp.find_one_float("scale", 1.0)
            g = tp.geom.find_floats("gamma")
            gamma = (float(g[0]) if g is not None and len(g)
                     else (None if fname.lower().endswith((".tga", ".png", ".jpg"))
                           else 1.0))
            try:
                img = read_image(fname, gamma=gamma) * scale
            except Exception as e:
                log.warning("imagemap %r: %s — using 0.5 constant", fname, e)
                return b.const_tex((0.5, 0.5, 0.5))
            img_id = b.add_image(img)
            # imagemap.cpp: "trilinear" bool (false => EWA), "maxanisotropy"
            filt = ("trilinear" if tp.find_one_bool("trilinear", False)
                    else "ewa")
            return b.add_texture(
                TexSpec(kind="image", image_id=img_id, filt=filt,
                        maxaniso=tp.find_one_float("maxanisotropy", 8.0),
                        **self._mapping_kwargs(tp)),
                w2t=w2t)
        log.warning("Unknown texture class %r; using constant 0.5", texclass)
        return b.const_tex((0.5, 0.5, 0.5))

    def _resolve(self, fname):
        if fname and not os.path.isabs(fname):
            return os.path.join(self.search_path, fname)
        return fname

    # ---------------------------------------------------------------- materials
    def material(self, name, params):
        self.gs.material = name
        self.gs.material_params = params
        self.gs.current_named_material = None

    def make_named_material(self, name, params):
        mtype = params.find_one_string("type", "matte")
        mid = self._build_material(mtype, TextureParams(
            ParamSet(), params, self.gs.float_textures, self.gs.spectrum_textures))
        self.gs.named_materials[name] = mid

    def named_material(self, name):
        self.gs.current_named_material = name

    def _current_material_id(self, shape_params):
        if self.gs.current_named_material is not None:
            mid = self.gs.named_materials.get(self.gs.current_named_material)
            if mid is None:
                log.warning("NamedMaterial %r unknown; using matte",
                            self.gs.current_named_material)
                return self.builder.matte()
            return mid
        tp = TextureParams(shape_params, self.gs.material_params,
                           self.gs.float_textures, self.gs.spectrum_textures)
        return self._build_material(self.gs.material, tp)

    def _build_material(self, mtype, tp):
        b = self.builder
        bump = tp.get_float_texture_or_none(b, "bumpmap")

        def lobe(**kw):
            return kw

        def add_mat(lobes):
            return b.add_material(lobes, bump=bump)

        if mtype in ("", "none"):
            return add_mat([])
        if mtype == "matte":
            kd = tp.get_spectrum_texture(b, "Kd", (0.5, 0.5, 0.5))
            sigma = tp.get_float_texture(b, "sigma", 0.0)
            return add_mat([lobe(
                type=bx.OREN_NAYAR, s0=kd, f0=sigma, f0_conv=CONV_RADIANS)])
        if mtype == "plastic":
            kd = tp.get_spectrum_texture(b, "Kd", (0.25,) * 3)
            ks = tp.get_spectrum_texture(b, "Ks", (0.25,) * 3)
            rough = tp.get_float_texture(b, "roughness", 0.1)
            ior = b.const_tex((1.5,) * 3)
            return add_mat([
                lobe(type=bx.LAMBERT, s0=kd),
                lobe(type=bx.BLINN, s0=ks, fr=bx.FR_DIELECTRIC, f0=rough,
                     f0_conv=CONV_INV, f2=ior)])
        if mtype == "glass":
            kr = tp.get_spectrum_texture(b, "Kr", (1.0,) * 3)
            kt = tp.get_spectrum_texture(b, "Kt", (1.0,) * 3)
            index = tp.get_float_texture(b, "index", 1.5)
            return add_mat([
                lobe(type=bx.SPEC_REFL, s0=kr, fr=bx.FR_DIELECTRIC, f2=index),
                lobe(type=bx.SPEC_TRANS, s0=kt, f2=index)])
        if mtype == "mirror":
            kr = tp.get_spectrum_texture(b, "Kr", (0.9,) * 3)
            return add_mat([lobe(type=bx.SPEC_REFL, s0=kr, fr=bx.FR_NOOP)])
        if mtype == "metal":
            eta = tp.get_spectrum_texture(b, "eta", COPPER_ETA)
            k = tp.get_spectrum_texture(b, "k", COPPER_K)
            rough = tp.get_float_texture(b, "roughness", 0.01)
            one = b.const_tex((1.0,) * 3)
            return add_mat([lobe(
                type=bx.BLINN, s0=one, s1=eta, s2=k, fr=bx.FR_CONDUCTOR,
                f0=rough, f0_conv=CONV_INV)])
        if mtype == "shinymetal":
            ks = tp.get_spectrum_texture(b, "Ks", (1.0,) * 3)
            kr = tp.get_spectrum_texture(b, "Kr", (1.0,) * 3)
            rough = tp.get_float_texture(b, "roughness", 0.1)
            # FresnelApproxEta/K from constant Kr (shinymetal.cpp); textured Kr
            # falls back to its average — divergence noted in module docstring
            kr_rgb = np.clip(self.builder.tex_const[kr], 0.0, 0.999)
            eta = (1.0 + np.sqrt(kr_rgb)) / (1.0 - np.sqrt(kr_rgb))
            kk = 2.0 * np.sqrt(kr_rgb) / np.sqrt(np.maximum(1.0 - kr_rgb, 1e-5))
            eta_t = b.const_tex(eta)
            k_t = b.const_tex(kk)
            return add_mat([
                lobe(type=bx.BLINN, s0=ks, s1=eta_t, s2=k_t, fr=bx.FR_CONDUCTOR,
                     f0=rough, f0_conv=CONV_INV),
                lobe(type=bx.SPEC_REFL, s0=kr, s1=eta_t, s2=k_t,
                     fr=bx.FR_CONDUCTOR)])
        if mtype == "substrate":
            kd = tp.get_spectrum_texture(b, "Kd", (0.5,) * 3)
            ks = tp.get_spectrum_texture(b, "Ks", (0.5,) * 3)
            ur = tp.get_float_texture(b, "uroughness", 0.1)
            vr = tp.get_float_texture(b, "vroughness", 0.1)
            return add_mat([lobe(
                type=bx.FRESNEL_BLEND, s0=kd, s1=ks, f0=ur, f1=vr,
                f0_conv=CONV_INV, f1_conv=CONV_INV)])
        if mtype == "translucent":
            kd = tp.get_spectrum_texture(b, "Kd", (0.25,) * 3)
            ks = tp.get_spectrum_texture(b, "Ks", (0.25,) * 3)
            refl = tp.get_spectrum_texture(b, "reflect", (0.5,) * 3)
            trans = tp.get_spectrum_texture(b, "transmit", (0.5,) * 3)
            rough = tp.get_float_texture(b, "roughness", 0.1)
            ior = b.const_tex((1.5,) * 3)
            rkd = b.add_texture(TexSpec(kind="scale", inputs=(refl, kd)))
            rks = b.add_texture(TexSpec(kind="scale", inputs=(refl, ks)))
            tkd = b.add_texture(TexSpec(kind="scale", inputs=(trans, kd)))
            tks = b.add_texture(TexSpec(kind="scale", inputs=(trans, ks)))
            return add_mat([
                lobe(type=bx.LAMBERT, s0=rkd),
                lobe(type=bx.BLINN, s0=rks, fr=bx.FR_DIELECTRIC, f0=rough,
                     f0_conv=CONV_INV, f2=ior),
                lobe(type=bx.LAMBERT_T, s0=tkd),
                lobe(type=bx.BLINN_T, s0=tks, fr=bx.FR_DIELECTRIC, f0=rough,
                     f0_conv=CONV_INV, f2=ior)])
        if mtype == "uber":
            kd = tp.get_spectrum_texture(b, "Kd", (0.25,) * 3)
            ks = tp.get_spectrum_texture(b, "Ks", (0.25,) * 3)
            kr = tp.get_spectrum_texture(b, "Kr", (0.0,) * 3)
            rough = tp.get_float_texture(b, "roughness", 0.1)
            index = tp.get_float_texture(b, "index", 1.5)
            opacity = tp.get_spectrum_texture(b, "opacity", (1.0,) * 3)
            one = b.const_tex((1.0,) * 3)
            inv_op = b.add_texture(TexSpec(kind="mix", inputs=(one, b.const_tex(
                (0.0,) * 3), opacity)))  # lerp(op, 1, 0) = 1-op
            okd = b.add_texture(TexSpec(kind="scale", inputs=(opacity, kd)))
            oks = b.add_texture(TexSpec(kind="scale", inputs=(opacity, ks)))
            okr = b.add_texture(TexSpec(kind="scale", inputs=(opacity, kr)))
            unity_ior = b.const_tex((1.0,) * 3)
            lobes = [
                lobe(type=bx.LAMBERT, s0=okd),
                lobe(type=bx.BLINN, s0=oks, fr=bx.FR_DIELECTRIC, f0=rough,
                     f0_conv=CONV_INV, f2=index),
                lobe(type=bx.SPEC_REFL, s0=okr, fr=bx.FR_DIELECTRIC, f2=index),
                # opacity pass-through: (1-op)·SpecularTransmission with ior 1
                lobe(type=bx.SPEC_TRANS, s0=inv_op, f2=unity_ior),
            ]
            return add_mat(lobes)
        if mtype == "mix":
            m1 = tp.find_one_string("namedmaterial1", "")
            m2 = tp.find_one_string("namedmaterial2", "")
            amount = tp.get_spectrum_texture(b, "amount", (0.5,) * 3)
            rows1 = (self.builder.mat_rows[self.gs.named_materials[m1]]
                     if m1 in self.gs.named_materials else [])
            rows2 = (self.builder.mat_rows[self.gs.named_materials[m2]]
                     if m2 in self.gs.named_materials else [])
            one = b.const_tex((1.0,) * 3)
            zero = b.const_tex((0.0,) * 3)
            inv_amount = b.add_texture(TexSpec(kind="mix",
                                               inputs=(one, zero, amount)))
            lobes = []
            for l in rows1:
                l2 = dict(l)
                l2["s0"] = b.add_texture(TexSpec(kind="scale",
                                                 inputs=(amount, l["s0"])))
                lobes.append(l2)
            for l in rows2:
                l2 = dict(l)
                l2["s0"] = b.add_texture(TexSpec(kind="scale",
                                                 inputs=(inv_amount, l["s0"])))
                lobes.append(l2)
            return add_mat(lobes)
        if mtype in ("subsurface", "kdsubsurface"):
            # record the BSSRDF medium for the dipole integrator
            # (subsurface.cpp: named media via GetVolumeScatteringProperties,
            # or explicit sigma_a / sigma_prime_s; kdsubsurface.cpp converts
            # Kd + meanfreepath via SubsurfaceFromDiffuse — the dipole-albedo
            # bisection inversion, volume.cpp RdToAlphap)
            from ..shade.media import MEASURED_MEDIA
            eta = tp.find_one_float("index", 1.3)
            name = tp.find_one_string("name", "")
            if mtype == "kdsubsurface":
                from ..engine.subsurface import subsurface_from_diffuse
                kd_rgb = tp.find_one_rgb("Kd", (0.5, 0.5, 0.5))
                mfp = tp.find_one_float("meanfreepath", 1.0)
                sa, sps = subsurface_from_diffuse(kd_rgb, mfp, eta)
                self.sss_sigma_a = sa
                self.sss_sigma_s = sps
            elif name and name in MEASURED_MEDIA:
                sa, sps = MEASURED_MEDIA[name]
                self.sss_sigma_a = tuple(sa)
                self.sss_sigma_s = tuple(sps)
            elif name:
                log.warning('Unknown scattering medium "%s"; using skin1', name)
            else:
                scale = tp.find_one_float("scale", 1.0)
                sa = tp.find_one_rgb("sigma_a", (0.0011, 0.0024, 0.014))
                sps = tp.find_one_rgb("sigma_prime_s", (2.55, 3.21, 3.77))
                self.sss_sigma_a = tuple(float(x) * scale for x in sa)
                self.sss_sigma_s = tuple(float(x) * scale for x in sps)
            self.sss_eta = eta
            # surface shell: specular reflection over a diffuse base, as the
            # dipole integrator shades direct light at the boundary
            kr = tp.get_spectrum_texture(b, "Kr", (1.0, 1.0, 1.0))
            kd = tp.get_spectrum_texture(b, "Kd", (0.5, 0.5, 0.5))
            return add_mat([lobe(type=bx.LAMBERT, s0=kd)])
        if mtype == "measured":
            fname = tp.geom.find_one_string(
                "filename", tp.mat.find_one_string("filename", ""))
            if fname:
                from ..shade import measured as msr
                try:
                    path = self._resolve(fname)
                    if path.endswith(".binary"):
                        table = msr.read_merl(path)
                    else:
                        angles, rgb = msr.read_brdf(path)
                        table = msr.bake_irregular(angles, rgb)
                    return b.add_measured_material(table)
                except Exception as e:
                    log.warning("measured material %r: %s; matte fallback",
                                fname, e)
            else:
                log.warning('measured material without "filename"; matte')
            kd = tp.get_spectrum_texture(b, "Kd", (0.5, 0.5, 0.5))
            return add_mat([lobe(type=bx.LAMBERT, s0=kd)])
        log.warning("Unknown material %r; using matte", mtype)
        return b.matte()

    # ------------------------------------------------------------------- lights
    def light_source(self, name, params):
        b = self.builder
        l2w = self.ctm.t[0]
        scale = params.find_one_rgb("scale", (1, 1, 1))
        if name == "point":
            i = params.find_one_rgb("I", (1, 1, 1)) * scale
            from_p = params.find_one_point("from", (0, 0, 0))
            b.add_point_light(tr.xform_p_np(l2w, from_p), i)
        elif name == "spot":
            i = params.find_one_rgb("I", (1, 1, 1)) * scale
            from_p = params.find_one_point("from", (0, 0, 0))
            to_p = params.find_one_point("to", (0, 0, 1))
            cone = params.find_one_float("coneangle", 30.0)
            delta = params.find_one_float("conedeltaangle", 5.0)
            # build light2world aiming from→to (spot.cpp CreateSpotLight)
            d = to_p - from_p
            d = d / max(np.linalg.norm(d), 1e-12)
            from ..core.vecmath import coordinate_system as _
            zaxis = d
            up = np.array([0, 1, 0.0]) if abs(d[1]) < 0.9 else np.array([1, 0, 0.0])
            x = np.cross(up, zaxis)
            x /= np.linalg.norm(x)
            y = np.cross(zaxis, x)
            m = tr.identity()
            m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, zaxis, from_p
            b.add_spot_light(l2w @ m, i, cone, delta)
        elif name == "distant":
            L = params.find_one_rgb("L", (1, 1, 1)) * scale
            from_p = params.find_one_point("from", (0, 0, 0))
            to_p = params.find_one_point("to", (0, 0, 1))
            b.add_distant_light(tr.xform_p_np(l2w, from_p),
                                tr.xform_p_np(l2w, to_p), L)
        elif name == "infinite":
            L = params.find_one_rgb("L", (1, 1, 1)) * scale
            mapname = params.find_one_string("mapname", "")
            env = None
            if mapname:
                from ..engine.imageio import read_image
                try:
                    env = read_image(self._resolve(mapname))
                except Exception as e:
                    log.warning("infinite light map %r: %s", mapname, e)
            b.add_infinite_light(l2w, L, env)
        elif name == "projection":
            i = params.find_one_rgb("I", (1, 1, 1)) * scale
            fov = params.find_one_float("fov", 45.0)
            img_id = self._light_image(params)
            b.add_projection_light(l2w, i, fov=fov, image_id=img_id)
        elif name == "goniometric":
            i = params.find_one_rgb("I", (1, 1, 1)) * scale
            img_id = self._light_image(params)
            b.add_goniometric_light(l2w, i, image_id=img_id)
        else:
            log.warning("Unknown light %r ignored", name)
        params.report_unused(f'LightSource "{name}"')

    def _light_image(self, params):
        """Load a light's "mapname" image into the builder; -1 when absent."""
        mapname = params.find_one_string("mapname", "")
        if not mapname:
            return -1
        from ..engine.imageio import read_image
        try:
            return self.builder.add_image(read_image(self._resolve(mapname)))
        except Exception as e:
            log.warning("light map %r: %s", mapname, e)
            return -1

    def area_light_source(self, name, params):
        self.gs.area_light = (name, params)

    # ------------------------------------------------------------------- shapes
    def shape(self, name, params):
        mesh = self._make_shape_mesh(name, params)
        if mesh is None:
            return
        verts, idx, normals, uvs, world_space = mesh
        if self.current_object is not None:
            self.objects[self.current_object].append(
                (verts, idx, normals, uvs, world_space, self.gs.clone(),
                 self.ctm.clone(), params))
            return
        self._emit_shape(verts, idx, normals, uvs, world_space, self.gs,
                         self.ctm, params)
        params.report_unused(f'Shape "{name}"')

    def _emit_shape(self, verts, idx, normals, uvs, world_space, gs, ctm,
                    shape_params=None):
        b = self.builder
        m = ctm.t[0]
        if ctm.is_animated() and not world_space and gs.area_light is None:
            # object motion blur (TransformedPrimitive with an animated
            # PrimitiveToWorld): emit as a single-instance TLAS object with
            # object-space geometry and the transform pair on the instance
            nrm = normals
            if nrm is not None:
                nn = np.linalg.norm(nrm, axis=1, keepdims=True)
                nrm = nrm / np.maximum(nn, 1e-12)
            mat_id = (self._current_material_id(shape_params or ParamSet())
                      if gs is self.gs else
                      self._material_id_for_state(gs, shape_params))
            obj_id = b.add_object()
            b.add_object_mesh(obj_id, verts, idx, mat_id, normals=nrm, uvs=uvs,
                              reverse_orientation=gs.reverse_orientation)
            b.add_instance(obj_id, ctm.t[0].copy(), ctm.t[1].copy())
            return
        if ctm.is_animated():
            log.warning("Animated transform on a world-space/area-light shape: "
                        "using the shutter-open key")
        if not world_space:
            verts = tr.xform_p_np(m, verts)
            if normals is not None:
                normals = tr.xform_n_np(tr.inverse(m), normals)
                norms = np.linalg.norm(normals, axis=1, keepdims=True)
                normals = normals / np.maximum(norms, 1e-12)
        emit = None
        nsamp = 1
        if gs.area_light is not None:
            _, ap = gs.area_light
            emit = ap.find_one_rgb("L", (1, 1, 1)) * ap.find_one_rgb(
                "scale", (1, 1, 1))
            nsamp = ap.find_one_int("nsamples", 1)
        mat_id = (self._current_material_id(shape_params or ParamSet())
                  if gs is self.gs else
                  self._material_id_for_state(gs, shape_params))
        alpha_tex = self._alpha_tex_for(shape_params, gs)
        b.add_mesh(verts, idx, mat_id, normals=normals, uvs=uvs,
                   reverse_orientation=gs.reverse_orientation,
                   swaps_handedness=bool(tr.swaps_handedness(m)),
                   area_light_emit=emit, n_samples=nsamp,
                   alpha_tex=alpha_tex)

    def _alpha_tex_for(self, shape_params, gs):
        """Alpha-cutout texture ("texture alpha" / "float alpha", pbrt
        trianglemesh.cpp Triangle::Intersect alpha test ~L230); -1 = opaque."""
        sp = shape_params or ParamSet()
        ref = sp.find_texture("alpha")
        if ref is not None:
            alpha_tex = gs.float_textures.get(ref, -1)
            if alpha_tex < 0:
                log.warning('alpha texture "%s" not found', ref)
            return alpha_tex
        a = sp.find_one_float("alpha", 1.0)
        if a != 1.0:
            return self.builder.const_tex((a, a, a))
        return -1

    def _material_id_for_state(self, gs, shape_params):
        saved = self.gs
        self.gs = gs
        try:
            return self._current_material_id(shape_params or ParamSet())
        finally:
            self.gs = saved

    def _make_shape_mesh(self, name, params):
        """Returns (verts, idx, normals, uvs, is_world_space) or None."""
        if name == "trianglemesh":
            idx = params.find_ints("indices")
            P = params.find_points("P")
            if idx is None or P is None:
                log.warning("trianglemesh missing indices/P; ignored")
                return None
            N = params.find_normals("N")
            uv = params.find_floats("uv")
            if uv is None:
                uv = params.find_floats("st")
            uvs = (np.asarray(uv, np.float32).reshape(-1, 2)
                   if uv is not None else None)
            return (np.asarray(P, np.float32),
                    np.asarray(idx, np.int64).reshape(-1, 3),
                    np.asarray(N, np.float32) if N is not None else None,
                    uvs, False)
        if name == "sphere":
            r = params.find_one_float("radius", 1.0)
            v, i, n, uv = shp.sphere(
                r, params.find_one_float("zmin", -r),
                params.find_one_float("zmax", r),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "cylinder":
            v, i, n, uv = shp.cylinder(
                params.find_one_float("radius", 1.0),
                params.find_one_float("zmin", -1.0),
                params.find_one_float("zmax", 1.0),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "disk":
            v, i, n, uv = shp.disk(
                params.find_one_float("height", 0.0),
                params.find_one_float("radius", 1.0),
                params.find_one_float("innerradius", 0.0),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "cone":
            v, i, n, uv = shp.cone(
                params.find_one_float("height", 1.0),
                params.find_one_float("radius", 1.0),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "paraboloid":
            v, i, n, uv = shp.paraboloid(
                params.find_one_float("radius", 1.0),
                params.find_one_float("zmin", 0.0),
                params.find_one_float("zmax", 1.0),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "hyperboloid":
            v, i, n, uv = shp.hyperboloid(
                params.find_one_point("p1", (0, 0, 0)),
                params.find_one_point("p2", (1, 1, 1)),
                params.find_one_float("phimax", 360.0))
            return v, i, n, uv, False
        if name == "loopsubdiv":
            P = params.find_points("P")
            idx = params.find_ints("indices")
            if P is None or idx is None:
                return None
            v, i, n, uv = shp.loop_subdivide(
                np.asarray(P, np.float32),
                np.asarray(idx, np.int64).reshape(-1, 3),
                params.find_one_int("nlevels", 3))
            return v, i, n, uv, False
        if name == "heightfield":
            nu = params.find_one_int("nu", 0)
            nv = params.find_one_int("nv", 0)
            z = params.find_floats("Pz")
            if not nu or not nv or z is None:
                return None
            v, i, n, uv = shp.heightfield(nu, nv, z)
            return v, i, n, uv, False
        if name == "nurbs":
            v, i, n, uv = shp.nurbs(
                params.find_one_int("nu", 0), params.find_one_int("uorder", 0),
                params.find_floats("uknots"),
                params.find_one_float("u0", 0.0), params.find_one_float("u1", 1.0),
                params.find_one_int("nv", 0), params.find_one_int("vorder", 0),
                params.find_floats("vknots"),
                params.find_one_float("v0", 0.0), params.find_one_float("v1", 1.0),
                params.find_points("P") if params.find_points("P") is not None
                else params.find_floats("Pw"),
                params.find_points("P") is None)
            return v, i, n, uv, False
        log.warning("Unknown shape %r ignored", name)
        return None

    # ---------------------------------------------------------------- instances
    def object_begin(self, name):
        self.attribute_begin()
        self.objects[name] = []
        self.current_object = name

    def object_end(self):
        self.current_object = None
        self.attribute_end()

    # objects at or below this triangle count are flattened into the base
    # soup (baking a couple of tris is cheaper than a TLAS visit); larger
    # objects share one BLAS across all their instances (TransformedPrimitive)
    INSTANCE_BAKE_MAX = 16

    def object_instance(self, name):
        if name not in self.objects:
            log.warning("ObjectInstance: unknown object %r", name)
            return
        shapes = self.objects[name]
        inst_ctm = self.ctm
        total = sum(len(s[1]) for s in shapes)
        if total <= self.INSTANCE_BAKE_MAX:
            for (verts, idx, normals, uvs, world_space, gs, obj_ctm,
                 shape_params) in shapes:
                combined = TransformSet()
                combined.t = [inst_ctm.t[i] @ obj_ctm.t[i] for i in range(2)]
                self._emit_shape(verts, idx, normals, uvs, world_space, gs,
                                 combined, shape_params)
            return
        b = self.builder
        obj_id = self._tlas_objects.get(name)
        if obj_id is None:
            obj_id = b.add_object()
            for (verts, idx, normals, uvs, world_space, gs, obj_ctm,
                 shape_params) in shapes:
                m = obj_ctm.t[0]
                if obj_ctm.is_animated():
                    log.warning("Animated CTM inside ObjectBegin %r: using the "
                                "start key (pbrt uses the CTM at shape time)",
                                name)
                ov, on = verts, normals
                if not world_space:
                    ov = tr.xform_p_np(m, verts)
                    if normals is not None:
                        on = tr.xform_n_np(tr.inverse(m), normals)
                        on = on / np.maximum(
                            np.linalg.norm(on, axis=1, keepdims=True), 1e-12)
                if gs.area_light is not None:
                    log.warning("Area light inside ObjectInstance %r ignored "
                                "(pbrt TransformedPrimitive carries no area "
                                "light)", name)
                mat_id = self._material_id_for_state(gs, shape_params)
                b.add_object_mesh(
                    obj_id, ov, idx, mat_id, normals=on, uvs=uvs,
                    reverse_orientation=gs.reverse_orientation,
                    swaps_handedness=(not world_space
                                      and bool(tr.swaps_handedness(m))),
                    alpha_tex=self._alpha_tex_for(shape_params, gs))
            self._tlas_objects[name] = obj_id
        b.add_instance(obj_id, inst_ctm.t[0].copy(), inst_ctm.t[1].copy())

    # ------------------------------------------------------------------ volumes
    def volume(self, name, params):
        """pbrtVolume → media region (src/volumes/*)."""
        from ..shade import media as med
        b = self.builder
        common = dict(
            v2w=self.ctm.t[0],
            p0=params.find_one_point("p0", (0, 0, 0)),
            p1=params.find_one_point("p1", (1, 1, 1)),
            sigma_a=params.find_one_rgb("sigma_a", (0.45,) * 3),
            sigma_s=params.find_one_rgb("sigma_s", (0.25,) * 3),
            g=params.find_one_float("g", 0.0),
            le=params.find_one_rgb("Le", (0, 0, 0)))
        if name == "homogeneous":
            b.add_volume(med.HOMOGENEOUS, **common)
        elif name == "volumegrid":
            nx = params.find_one_int("nx", 1)
            ny = params.find_one_int("ny", 1)
            nz = params.find_one_int("nz", 1)
            dens = params.find_floats("density")
            if dens is None:
                log.warning("volumegrid without density ignored")
                return
            grid = np.asarray(dens, np.float32).reshape(nz, ny, nx)
            b.add_volume(med.GRID, density=grid, **common)
        elif name == "exponential":
            b.add_volume(
                med.EXPONENTIAL,
                exp_a=params.find_one_float("a", 1.0),
                exp_b=params.find_one_float("b", 1.0),
                updir=params.find_one_point("updir", (0, 1, 0)), **common)
        else:
            log.warning("Unknown volume %r ignored", name)
        params.report_unused(f'Volume "{name}"')

    # ------------------------------------------------------------------- finish
    def world_end(self):
        """MakeRenderer + MakeScene → (scene, meta, run config)."""
        b = self.builder
        # film/filter
        b.xres = self.film_params.find_one_int("xresolution", 640)
        b.yres = self.film_params.find_one_int("yresolution", 480)
        cw = self.film_params.find_floats("cropwindow")
        if cw is not None and len(cw) == 4:
            # image.cpp ctor clamps and orders the crop window
            x0, x1 = sorted((max(0.0, min(1.0, cw[0])),
                             max(0.0, min(1.0, cw[1]))))
            y0, y1 = sorted((max(0.0, min(1.0, cw[2])),
                             max(0.0, min(1.0, cw[3]))))
            b.crop = (x0, x1, y0, y1)
        self.out_filename = self.film_params.find_one_string(
            "filename", "out.exr")
        fname_map = {"box": "box", "triangle": "triangle",
                     "gaussian": "gaussian", "mitchell": "mitchell",
                     "sinc": "sinc"}
        fkind = fname_map.get(self.filter_name, "box")
        kw = {}
        xw = self.filter_params.find_floats("xwidth")
        yw = self.filter_params.find_floats("ywidth")
        if xw is not None and len(xw):
            kw["xwidth"] = float(xw[0])
        if yw is not None and len(yw):
            kw["ywidth"] = float(yw[0])
        if fkind == "gaussian":
            kw["alpha"] = self.filter_params.find_one_float("alpha", 2.0)
        if fkind == "mitchell":
            kw["b"] = self.filter_params.find_one_float("B", 1.0 / 3.0)
            kw["c"] = self.filter_params.find_one_float("C", 1.0 / 3.0)
        if fkind == "sinc":
            kw["tau"] = self.filter_params.find_one_float("tau", 3.0)
        b.filter = FilterConfig.from_name(fkind, **kw)

        # sampler
        spp = self.sampler_params.find_one_int(
            "pixelsamples", self.sampler_params.find_one_int("nsamples", 4))
        kind_map = {"lowdiscrepancy": ZERO_TWO, "02sequence": ZERO_TWO,
                    "stratified": STRATIFIED, "halton": HALTON,
                    "random": RANDOM, "bestcandidate": ZERO_TWO,
                    "adaptive": ZERO_TWO}
        skind = kind_map.get(self.sampler_name, ZERO_TWO)
        if self.sampler_name == "stratified":
            xs = self.sampler_params.find_one_int("xsamples", 2)
            ys = self.sampler_params.find_one_int("ysamples", 2)
            spp = xs * ys
        if self.sampler_name == "bestcandidate":
            log.warning("Sampler %r mapped to scrambled (0,2)-sequence",
                        self.sampler_name)
        if self.sampler_name == "adaptive":
            # adaptive.cpp "minsamples"/"maxsamples" → between-wave re-queue
            # (engine.render.render_adaptive); base sequence is (0,2)
            self.adaptive = {
                "min": self.sampler_params.find_one_int("minsamples", 4),
                "max": self.sampler_params.find_one_int("maxsamples", 32)}
            spp = self.adaptive["max"]
        b.sampler = SamplerConfig(kind=skind, spp=spp)

        # camera
        cam_map = {"perspective": cam.PERSPECTIVE,
                   "orthographic": cam.ORTHOGRAPHIC,
                   "environment": cam.ENVIRONMENT}
        ckind = cam_map.get(self.camera_name, cam.PERSPECTIVE)
        sw = self.camera_params.find_floats("screenwindow")
        b.camera = cam.build_camera(
            ckind, self.camera_to_world.t[0], self.camera_to_world.t[1],
            b.xres, b.yres,
            fov=self.camera_params.find_one_float("fov", 90.0),
            screen_window=list(sw) if sw is not None and len(sw) == 4 else None,
            lens_radius=self.camera_params.find_one_float("lensradius", 0.0),
            focal_distance=self.camera_params.find_one_float(
                "focaldistance", 1e6),
            shutter_open=self.camera_params.find_one_float("shutteropen", 0.0),
            shutter_close=self.camera_params.find_one_float("shutterclose", 1.0))

        # integrator
        imap = {"path": "path", "directlighting": "direct", "whitted": "whitted",
                "ambientocclusion": "ao", "igi": "igi", "photonmap": "photon",
                "exphotonmap": "photon", "diffuseprt": "diffuseprt",
                "glossyprt": "glossyprt", "useprobes": "useprobes",
                "irradiancecache": "irradiancecache",
                "dipolesubsurface": "dipole"}
        ikind = imap.get(self.integrator_name)
        if ikind is None:
            log.warning("Surface integrator %r not yet implemented; using path",
                        self.integrator_name)
            ikind = "path"
        strat = self.integrator_params.find_one_string("strategy", "all")
        vmap_ = {"emission": "emission", "single": "single"}
        self.integrator_config = IntegratorConfig(
            kind=ikind,
            max_depth=self.integrator_params.find_one_int("maxdepth", 5),
            light_strategy={"all": "all", "one": "one"}.get(strat, "all")
            if ikind == "direct" else "one",
            ao_samples=self.integrator_params.find_one_int("nsamples", 2048)
            if ikind == "ao" else 1,
            ao_maxdist=self.integrator_params.find_one_float("maxdist", 1e7),
            vol=vmap_.get(self.vol_integrator_name, "emission"),
            vol_stepsize=self.vol_integrator_params.find_one_float(
                "stepsize", 0.1),
            igi_n_paths=self.integrator_params.find_one_int("nlights", 64),
            igi_n_sets=self.integrator_params.find_one_int("nsets", 4),
            igi_g_limit=self.integrator_params.find_one_float("glimit", 10.0),
            photon_paths=self.integrator_params.find_one_int(
                "indirectphotons", 16384) // 4,
            photon_radius=self.integrator_params.find_one_float("maxdist", 0.1),
            photon_final_gather=self.integrator_params.find_one_bool(
                "finalgather", True),
            # PRT family (diffuseprt.cpp "lmax"/"nsamples"; useprobes
            # "filename"; createprobes bakes via probes_res)
            prt_lmax=self.integrator_params.find_one_int("lmax", 4),
            prt_nsamples=min(self.integrator_params.find_one_int(
                "nsamples", 64), 256) if ikind in
                ("diffuseprt", "glossyprt", "useprobes") else 64,
            probes_file=self.integrator_params.find_one_string("filename", ""),
            # irradiance cache (irradiancecache.cpp params)
            ic_nsamples=min(self.integrator_params.find_one_int(
                "nsamples", 64), 256) if ikind == "irradiancecache" else 64,
            ic_maxerror=self.integrator_params.find_one_float("maxerror", 0.2),
            # dipole subsurface (dipolesubsurface.cpp + named media)
            sss_maxerror=self.integrator_params.find_one_float(
                "maxerror", 0.05) if ikind == "dipole" else 0.05,
            sss_sigma_a=tuple(self.sss_sigma_a),
            sss_sigma_s=tuple(self.sss_sigma_s),
            sss_eta=self.sss_eta)

        self.mlt_config = None
        if self.renderer_name == "metropolis":
            from ..engine.metropolis import MLTConfig
            rp = self.renderer_params
            self.mlt_config = MLTConfig(
                max_depth=rp.find_one_int("maxdepth", 7),
                n_bootstrap=rp.find_one_int("bootstrapsamples", 4096),
                large_step_prob=rp.find_one_float("largestepprobability", 0.25),
                mutations_per_wave=16,
                bidirectional=rp.find_one_bool("bidirectional", True),
                direct_separate=rp.find_one_bool("dodirectseparately", False))
            self.mlt_spp = rp.find_one_int("samplesperpixel", 32)
        self.probe_bake = None
        self.surfacepoints_out = None
        if self.renderer_name == "createprobes":
            # createprobes.cpp: bake an SH radiance-probe grid to a file
            rp = self.renderer_params
            self.probe_bake = {
                "lmax": rp.find_one_int("lmax", 4),
                "nsamples": min(rp.find_one_int("directsamples", 64), 256),
                "filename": rp.find_one_string("filename", "probes.out"),
                "spacing": rp.find_one_float("samplespacing", 1.0),
            }
        elif self.renderer_name == "surfacepoints":
            # surfacepoints.cpp: write the sampled surface point cloud
            rp = self.renderer_params
            self.surfacepoints_out = {
                "filename": rp.find_one_string("filename", "surfacepoints.out"),
                "npoints": 4096,
            }
        elif self.renderer_name not in ("sampler", "aggregatetest",
                                        "metropolis", ""):
            log.warning("Renderer %r falls back to the sampler renderer",
                        self.renderer_name)
        if self.accelerator_name not in ("bvh", ""):
            log.warning("Accelerator %r mapped to BVH", self.accelerator_name)

        # ReportUnused on every pre-world ParamSet (api.cpp does this per factory)
        for ps, ctx in ((self.camera_params, f'Camera "{self.camera_name}"'),
                        (self.film_params, f'Film "{self.film_name}"'),
                        (self.sampler_params, f'Sampler "{self.sampler_name}"'),
                        (self.filter_params, f'PixelFilter "{self.filter_name}"'),
                        (self.integrator_params,
                         f'SurfaceIntegrator "{self.integrator_name}"')):
            ps.report_unused(ctx)

        scene, meta = b.finalize()
        self.state = STATE_OPTIONS
        return scene, meta
