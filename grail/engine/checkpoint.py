"""Checkpoint / resume — a capability the reference lacks (SURVEY §5.4).

pbrt-v2 holds the film in RAM and writes it once at the end
(src/film/image.cpp ImageFilm::WriteImage, called from
src/renderers/samplerrenderer.cpp SamplerRenderer::Render); a killed render
loses everything. Here the full render state is a small pytree — the
functional film {rgb_sum, weight_sum, splat} plus the wave counter — and the
sampler is counter-based (core/rng.py), so `resume(load(...))` continues
**bitwise identically** to an uninterrupted run: wave s always draws
u = f(pixel, s, dim) regardless of process restarts or chip count.

Format: a single .npz (portable, no framework lock-in). A scene fingerprint
guards against resuming with a different scene/config. Orbax is available in
the image but overkill for a <100MB pytree; npz keeps the tool chain-free.
"""
from __future__ import annotations

import hashlib
import json

import numpy as np


FORMAT_VERSION = 1


def scene_fingerprint(meta, cfg) -> str:
    """Cheap stable hash of the render configuration (not the scene buffers —
    geometry is minted deterministically from the same .pbrt input)."""
    payload = {
        "xres": meta.xres, "yres": meta.yres,
        "spp": meta.sampler.spp, "kind": meta.sampler.kind,
        "integrator": getattr(cfg, "kind", "?"),
        "max_depth": getattr(cfg, "max_depth", 0),
        "n_tris": int(meta.n_tris), "n_lights": int(meta.n_lights),
    }
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def save(path, film, next_wave: int, meta=None, cfg=None, extra=None):
    """Dump render state. film: engine.film pytree; next_wave: first wave NOT
    yet accumulated. extra: optional dict of numpy-able leaves (e.g. adaptive
    sampling counts, optimizer state)."""
    arrays = {
        "rgb": np.asarray(film["rgb"]),
        "weight": np.asarray(film["weight"]),
        "splat": np.asarray(film["splat"]),
        "next_wave": np.int64(next_wave),
        "format_version": np.int64(FORMAT_VERSION),
    }
    if meta is not None and cfg is not None:
        arrays["fingerprint"] = np.frombuffer(
            scene_fingerprint(meta, cfg).encode(), dtype=np.uint8)
    for k, v in (extra or {}).items():
        arrays["extra_" + k] = np.asarray(v)
    tmp = str(path) + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    import os
    os.replace(tmp, path)   # atomic publish: no torn checkpoints on kill


def load(path, meta=None, cfg=None):
    """Returns (film, next_wave, extra). Raises ValueError on a fingerprint
    mismatch (resuming a different scene/config would silently corrupt)."""
    import jax.numpy as jnp
    with np.load(path) as z:
        ver = int(z["format_version"])
        if ver != FORMAT_VERSION:
            raise ValueError(f"checkpoint format {ver} != {FORMAT_VERSION}")
        if meta is not None and cfg is not None and "fingerprint" in z:
            want = scene_fingerprint(meta, cfg)
            got = bytes(z["fingerprint"]).decode()
            if got != want:
                raise ValueError(
                    f"checkpoint fingerprint {got} does not match scene {want}")
        film = {"rgb": jnp.asarray(z["rgb"]),
                "weight": jnp.asarray(z["weight"]),
                "splat": jnp.asarray(z["splat"])}
        next_wave = int(z["next_wave"])
        extra = {k[len("extra_"):]: z[k] for k in z.files
                 if k.startswith("extra_")}
    return film, next_wave, extra
