"""Benchmark: path-tracing rays/s on the available device.

Two scenes: the Cornell box (BASELINE config 1/2 geometry; brute-force
intersection path) and the 100k-triangle textured terrain + environment light
(BASELINE config 3; SAH BVH + Pallas streaming traversal). Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline", ...extras}. The reference
(pbrt-v2) publishes no numbers (BASELINE.md), so vs_baseline compares the
primary metric against the previous round's recording when present, else 1.0.
"""
import glob
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def _bench_scene(make_scene, spp, max_depth):
    import jax
    from grail.engine.render import render, auto_spp_chunk
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = make_scene()
    cfg = IntegratorConfig(kind="path", max_depth=max_depth)
    # compile + warmup: one chunk's worth of spp (same shapes as the timed run)
    chunk = auto_spp_chunk(meta, spp)
    _, film = render(scene, meta, cfg, spp=min(chunk, spp))
    jax.block_until_ready(film)
    t0 = time.perf_counter()
    _, film = render(scene, meta, cfg, spp=spp)
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    return meta.xres * meta.yres * spp / dt


def _previous_value():
    """Most recent BENCH_r*.json primary value (handles r1 and r01 naming)."""
    best = None
    best_n = -1
    for p in glob.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        n = int(m.group(1))
        if n > best_n:
            try:
                with open(p) as f:
                    j = json.load(f)
                # driver rounds wrap the line under "parsed"
                v = j.get("value") or j.get("parsed", {}).get("value")
                if v:
                    best, best_n = v, n
            except Exception:
                pass
    return best


def main():
    from grail.scene.presets import cornell_box, mesh_scene

    xres = yres = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    max_depth = int(os.environ.get("BENCH_DEPTH", "5"))

    cornell_rps = _bench_scene(
        lambda: cornell_box(xres=xres, yres=yres, spp=spp), spp, max_depth)
    mesh_rps = _bench_scene(
        lambda: mesh_scene(xres=xres, yres=yres, spp=spp), spp, max_depth)

    prev = _previous_value()
    vs = cornell_rps / prev if prev else 1.0
    print(json.dumps({
        "metric": "camera_rays_per_sec_path_cornell",
        "value": round(cornell_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "mesh100k_rays_per_sec": round(mesh_rps, 1),
    }))


if __name__ == "__main__":
    main()
