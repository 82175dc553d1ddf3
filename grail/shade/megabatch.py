"""Material-sorted megabatch shading (SURVEY §2.5 TPU-equiv mandate).

pbrt dispatches BSDF work through per-material virtual calls
(src/core/reflection.cpp BSDF::f over BxDF vtables); the masked-wavefront
analog used through round 4 evaluated EVERY texture row and EVERY lobe type
for EVERY lane under masks. This module is the sorted replacement:

  1. counting-sort the shade queue by material id (kernels/binning.py's
     stable bucket rank — one small-K MXU pass, far cheaper than an argsort),
  2. reshape the sorted queue into fixed-size blocks; after sorting, at most
     n_materials-1 blocks straddle a material boundary,
  3. lax.map over blocks with a lax.switch whose branches are STATICALLY
     SPECIALIZED per material from SceneMeta.mat_specs: each branch evaluates
     only that material's texture-row closure and only its lobe types, with
     all type/fresnel/conversion tags folded to compile-time constants
     (uniform blocks take their material's branch; mixed blocks take a
     generic branch identical to the old masked path; all-dead blocks take a
     constant-zero branch),
  4. scatter results back to original lane order.

Every per-lane formula is the one the masked path computes (where(True, x, 0)
folds to x), so results are bitwise-equal to the unsorted evaluation — the
sort only removes work for lanes that a formula's mask would zero anyway.

The pass fuses the three per-bounce BSDF uses into one sorted visit: the
light-branch f/pdf of EstimateDirect, the continuation Sample_f, and the
path-vertex-reuse partner pdf (pbrt integrator.cpp EstimateDirect ~L100 +
path.cpp ~L90), so the queue is sorted once per bounce.

MEASURED VERDICT (round 5, TPU v5e, 1M-lane waves, chained timings): OFF BY
DEFAULT. On this hardware the sorted dispatch cannot pay:
  * the full-width masked pass is already fast — ~4.7 ms/Mlane (212 Mrays/s)
    for the whole fused BSDF work, because the masked path is ALREADY
    specialized at compile time over the scene's static lobe/texture sets
    (meta.lobe_types / tex_specs) — pbrt's per-lane virtual dispatch has no
    analog here to begin with;
  * permutation scatters/gathers whose indices are computed in-graph compile
    to XLA:TPU's slow generic path: ~15 ms per fused gather group and ~37 ms
    per fused scatter group at 1M lanes (vs 0.03 ms when indices arrive as
    jit arguments), so the sort+unsort alone costs ~10x the work it saves;
  * lax.map over blocks adds ~0.3-2 ms per block step.
  Cornell end-to-end: 2.96M rays/s masked vs 0.65M sorted. Ray RE-BINNING
  (kernels/binning.py) stays profitable because it feeds a traversal that
  costs ~600 ms/Mray incoherent — 40 ms of permutes buy a 2x win there;
  shading at ~5 ms buys nothing. The flag remains for correctness tests and
  for backends with cheap permutes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.binning import bucket_rank, sort_by_rank
from .textures import eval_textures, rows_closure
from .materials import CONV_INV, CONV_RADIANS, MAT_FIELDS
from . import bsdf as bx
from . import geometry as geom
from . import materials as mtl


def _convert_static(x, conv):
    """gather_lobes' f0/f1 conversion with a compile-time tag (same
    formulas, so values are bitwise-equal to the masked select)."""
    if conv == CONV_INV:
        return 1.0 / jnp.maximum(x, 1e-5)
    if conv == CONV_RADIANS:
        return x * (3.14159265 / 180.0)
    return x


def _lobes_from_spec(spec_m, vals, n):
    """Build the (B,K_m) lobes dict for one material from its static slot
    tuples and the evaluated texture-row dict (no one-hot gathers)."""
    idx = {f: i for i, f in enumerate(MAT_FIELDS)}

    def stack(field, rgb):
        cols = []
        for slot in spec_m:
            v = vals[slot[idx[field]]]
            cols.append(v if rgb else v[:, 0])
        return jnp.stack(cols, axis=1)

    f0 = jnp.stack([_convert_static(vals[s[idx["f0"]]][:, 0], s[idx["f0_conv"]])
                    for s in spec_m], axis=1)
    f1 = jnp.stack([_convert_static(vals[s[idx["f1"]]][:, 0], s[idx["f1_conv"]])
                    for s in spec_m], axis=1)
    const = lambda field: jnp.broadcast_to(
        jnp.asarray([s[idx[field]] for s in spec_m], jnp.int32),
        (n, len(spec_m)))
    return {
        "type": const("lobe_type"),
        "fr": const("fr"),
        "R": stack("s0", True),
        "S1": stack("s1", True),
        "S2": stack("s2", True),
        "f0": f0,
        "f1": f1,
        "f2": stack("f2", False),
    }


def _shade_one(lobes, blk, present, tables, block):
    """The fused per-bounce BSDF work over one block, given its lobe stack."""
    wo = blk["wo"]
    sgf = {"ss": blk["ss"], "ts": blk["ts"], "ns": blk["ns"]}
    f_l = bx.bsdf_f(lobes, wo, blk["wil"], present, include_specular=False,
                    tables=tables)
    pdf_l = bx.bsdf_pdf(lobes, wo, blk["wil"], present, include_specular=False)
    bs = bx.bsdf_sample(lobes, wo, blk["u1"], blk["u2"], blk["uc"], present,
                        include_specular=True, tables=tables)
    wi_w = geom.local_to_world(sgf, bs["wi"])
    # partner pdf for path-vertex-reuse MIS: the same local/world round trip
    # the unsorted body makes (bitwise identical MIS weights)
    pdf_prev = bx.bsdf_pdf(lobes, wo, geom.world_to_local(sgf, wi_w), present,
                           include_specular=False)
    return {"f_l": f_l, "pdf_l": pdf_l, "wi_w": wi_w, "f": bs["f"],
            "pdf": bs["pdf"], "spec": bs["specular"], "valid": bs["valid"],
            "pdf_prev_nospec": pdf_prev}


def _make_branches(scene, meta, block):
    """One specialized branch per material + generic + dead."""
    tables = scene.get("brdf_tables", ())
    tex_data = scene["tex_data"]
    images = scene.get("images", ())
    mipmaps = scene.get("mipmaps", ())

    def sg_of(blk):
        sg = {"p": blk["p"], "uv": blk["uv"]}
        if "duvdx" in blk:
            sg["duvdx"] = blk["duvdx"]
            sg["duvdy"] = blk["duvdy"]
        return sg

    def specialized(m):
        spec_m = meta.mat_specs[m]
        idx = {f: i for i, f in enumerate(MAT_FIELDS)}
        rows = {slot[idx[f]] for slot in spec_m
                for f in ("s0", "s1", "s2", "f0", "f1", "f2")}
        needed = rows_closure(meta.tex_specs, rows)
        present = tuple(sorted({slot[idx["lobe_type"]] for slot in spec_m}
                               - {bx.NONE}))

        def fn(blk):
            vals = eval_textures(meta.tex_specs, tex_data, sg_of(blk), images,
                                 mipmaps, needed=needed, as_dict=True)
            lobes = _lobes_from_spec(spec_m, vals, block)
            return _shade_one(lobes, blk, present, tables, block)
        return fn

    def generic(blk):
        tex_values = eval_textures(meta.tex_specs, tex_data, sg_of(blk),
                                   images, mipmaps)
        lobes = mtl.gather_lobes(scene, {"mat": blk["mat"]}, tex_values)
        return _shade_one(lobes, blk, meta.lobe_types, tables, block)

    def dead(blk):
        z3 = jnp.zeros((block, 3), jnp.float32)
        z1 = jnp.zeros((block,), jnp.float32)
        zb = jnp.zeros((block,), jnp.bool_)
        return {"f_l": z3, "pdf_l": z1, "wi_w": z3, "f": z3, "pdf": z1,
                "spec": zb, "valid": zb, "pdf_prev_nospec": z1}

    M = len(meta.mat_specs)
    return [specialized(m) for m in range(M)] + [generic, dead]


# benign padding template (see NaN note below): a valid z-up frame and
# mid-range samples so padded lanes flow finite values through every branch
_PAD = {"wo": (0.0, 0.0, 1.0), "wil": (0.0, 0.0, 1.0), "ns": (0.0, 0.0, 1.0),
        "ss": (1.0, 0.0, 0.0), "ts": (0.0, 1.0, 0.0), "p": (0.0, 0.0, 0.0),
        "uv": (0.5, 0.5), "u1": 0.5, "u2": 0.5, "uc": 0.5, "mat": 0,
        "duvdx": (0.0, 0.0), "duvdy": (0.0, 0.0)}


def megabatch_shade(scene, meta, sg, wo_local, wi_l_local, u1, u2, u_comp,
                    active, block=8192):
    """Sorted, per-material-specialized shading pass.

    sg: full shading record (p/uv/ns/ss/ts [+duvdx/duvdy on the primary
    wave]); wo_local, wi_l_local: outgoing / light-sample directions in the
    local frame; u1,u2,u_comp: continuation Sample_f draws. Lanes with
    ~active or mat<0 route to the dead branch. Returns per-lane dict in
    ORIGINAL lane order: f_l, pdf_l (light branch), wi_w, f, pdf, spec, valid
    (continuation), pdf_prev_nospec (reuse-MIS partner pdf).

    Padding lanes (to a block multiple) carry a benign unit frame rather than
    zeros: their outputs are dropped, but zero-vector inputs would push NaNs
    through normalize() in mixed blocks, and a masked-out NaN forward value
    still poisons reverse-mode AD (the round-3 masked-NaN lesson).
    """
    n = wo_local.shape[0]
    M = len(meta.mat_specs)
    inputs = {"wo": wo_local, "wil": wi_l_local, "u1": u1, "u2": u2,
              "uc": u_comp, "p": sg["p"], "uv": sg["uv"], "ns": sg["ns"],
              "ss": sg["ss"], "ts": sg["ts"],
              "mat": jnp.maximum(sg["mat"], 0)}
    if "duvdx" in sg:
        inputs["duvdx"] = sg["duvdx"]
        inputs["duvdy"] = sg["duvdy"]
    key = jnp.where(active & (sg["mat"] >= 0), jnp.maximum(sg["mat"], 0), M)

    pad = -n % block
    if pad:
        def padded(k, a):
            t = jnp.asarray(_PAD[k], a.dtype)
            return jnp.concatenate(
                [a, jnp.broadcast_to(t, (pad,) + a.shape[1:])])
        inputs = {k: padded(k, a) for k, a in inputs.items()}
        key = jnp.concatenate([key, jnp.full((pad,), M, key.dtype)])
    np_ = n + pad

    rank = bucket_rank(key, M + 1)
    keys_s = sort_by_rank(rank, key)[0]
    sorted_in = dict(zip(inputs.keys(),
                         sort_by_rank(rank, *inputs.values())))

    nb = np_ // block
    blocks = {k: a.reshape((nb, block) + a.shape[1:])
              for k, a in sorted_in.items()}
    ks = keys_s.reshape(nb, block)
    first, last = ks[:, 0], ks[:, -1]
    uniform = first == last
    blocks["branch"] = jnp.where(
        uniform, jnp.where(first == M, M + 1, first), M)

    branches = _make_branches(scene, meta, block)
    out = jax.lax.map(
        lambda blk: jax.lax.switch(blk["branch"], branches, blk), blocks)
    flat = {k: v.reshape((np_,) + v.shape[2:]) for k, v in out.items()}
    return {k: v[rank][:n] for k, v in flat.items()}
