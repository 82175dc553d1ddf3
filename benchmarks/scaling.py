"""Scaling-efficiency harness (BASELINE north star: >=80% rays/s efficiency
1 chip -> N; SURVEY §5.8).

Measures the fused sharded render (dist/sharding.render_sharded) at mesh
sizes 1..N over whatever devices exist: real chips on a pod slice (launch one
process per host with COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID or
GRAIL_DIST=1), or 8 virtual CPU devices for the code-path check
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu —
virtual-device timings validate plumbing, not hardware scaling: the shards
share one physical core, so wall time should stay ~flat as N grows, which is
exactly what ideal scaling looks like under core-sharing).

Usage: python benchmarks/scaling.py [--json out.json]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from grail.dist.sharding import (maybe_init_distributed, make_mesh,
                                     render_sharded)
    from grail.scene.presets import cornell_box
    from grail.engine.integrator import IntegratorConfig

    maybe_init_distributed()
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={len(devs)}")

    xres = yres = int(os.environ.get("SCALING_RES", "128"))
    spp = int(os.environ.get("SCALING_SPP", "8"))
    scene, meta, _ = cornell_box(xres=xres, yres=yres, spp=spp)
    cfg = IntegratorConfig(kind="path", max_depth=4)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    rows = []
    base = None
    for n in sizes:
        mesh = make_mesh(n_devices=n)
        img, film = render_sharded(scene, meta, cfg, spp, mesh)  # compile
        jax.block_until_ready(film)
        t0 = time.perf_counter()
        img, film = render_sharded(scene, meta, cfg, spp, mesh)
        jax.block_until_ready(film)
        dt = time.perf_counter() - t0
        rays = xres * yres * spp / dt
        if base is None:
            base = rays
        eff = rays / (base * n)
        rows.append({"n_devices": n, "wall_s": round(dt, 4),
                     "rays_per_sec": round(rays, 1),
                     "efficiency_vs_linear": round(eff, 4)})
        print(f"n={n:3d}  {dt*1e3:9.2f} ms  {rays/1e6:8.3f} Mrays/s  "
              f"eff={eff:.2%}")

    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            note = ("PLUMBING-ONLY when devices are virtual CPU shards of "
                    "fewer physical cores: wall stays flat by construction; "
                    "efficiency_vs_linear is NOT a hardware-scaling claim")
            json.dump({"backend": jax.default_backend(),
                       "n_devices_total": len(devs),
                       "note": note,
                       "res": xres, "spp": spp, "rows": rows}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
