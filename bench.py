"""Benchmark: Cornell-box path tracing rays/s on the available device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The reference
(pbrt-v2) publishes no numbers (BASELINE.md), so vs_baseline compares against the
previous round's recording when present, else 1.0.
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


def main():
    import jax
    from grail.scene.presets import cornell_box
    from grail.engine.render import render, auto_spp_chunk
    from grail.engine.integrator import IntegratorConfig

    xres = yres = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    max_depth = int(os.environ.get("BENCH_DEPTH", "5"))

    scene, meta, _ = cornell_box(xres=xres, yres=yres, spp=spp)
    cfg = IntegratorConfig(kind="path", max_depth=max_depth)

    # compile + warmup: one chunk's worth of spp (same shapes as the timed run)
    chunk = auto_spp_chunk(meta, spp)
    _, film = render(scene, meta, cfg, spp=min(chunk, spp))
    jax.block_until_ready(film)

    t0 = time.perf_counter()
    _, film = render(scene, meta, cfg, spp=spp)
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0

    camera_rays = xres * yres * spp
    # traced rays per camera ray: per bounce → 1 extend + 1 shadow + 1 MIS ray
    rays_per_sec = camera_rays / dt

    prev = None
    for n in range(10, 0, -1):
        p = f"BENCH_r{n}.json"
        if os.path.exists(p):
            try:
                with open(p) as f:
                    prev = json.load(f).get("value")
                break
            except Exception:
                pass
    vs = rays_per_sec / prev if prev else 1.0
    print(json.dumps({
        "metric": "camera_rays_per_sec_path_cornell",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
