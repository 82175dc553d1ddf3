"""Instanced-scene benchmark (round-5 verdict item 4 'done' criterion):
a 100-instance x 50k-tri scene must render within ~3x of the equivalent
flattened mesh (pbrt TransformedPrimitive contract: instancing is cheap,
src/core/primitive.cpp).

Renders the same sphere field twice — once as 100 TransformedPrimitive
instances of one 50k-tri object (TLAS sweep + stream-kernel BLAS), once with
all 5M world-space triangles baked into the base soup (clustered stream
tables) — and reports camera-rays/s for both.

Usage: python benchmarks/instbench.py [--json out.json]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_INST = 10 * 10
SPHERE_NU, SPHERE_NV = 224, 112          # ~50k tris


def _builder(res):
    import numpy as np
    from grail.scene.buffers import SceneBuilder
    from grail.core import transform as tr
    from grail.engine import camera as cam

    b = SceneBuilder()
    b.xres = b.yres = res
    b.matte(kd=(0.6, 0.6, 0.6))
    b.matte(kd=(0.7, 0.4, 0.3))
    ext = 14.0
    b.add_mesh(np.array([[-ext, 0, -ext], [ext, 0, -ext], [ext, 0, ext],
                         [-ext, 0, ext]], np.float32),
               np.array([[0, 1, 2], [0, 2, 3]], np.int64), 0)
    b.add_point_light((0.0, 24.0, 0.0), (2200.0, 2200.0, 2200.0))
    c2w = tr.look_at((0, 18.0, 22.0), (0, 0.5, 0), (0, 1, 0))
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, res, res, fov=55.0)
    return b


def _positions():
    out = []
    for r in range(10):
        for c in range(10):
            out.append((-9.0 + 2.0 * c, 0.55, -9.0 + 2.0 * r))
    return out


def build_instanced(res):
    from grail.scene.shapes import sphere
    from grail.core import transform as tr
    v, i, n, uv = sphere(radius=0.5, nu=SPHERE_NU, nv=SPHERE_NV)
    b = _builder(res)
    oid = b.add_object()
    b.add_object_mesh(oid, v, i, 1, normals=n, uvs=uv)
    for p in _positions():
        b.add_instance(oid, tr.translate(p))
    return b.finalize()


def build_flattened(res):
    import numpy as np
    from grail.scene.shapes import sphere
    v, i, n, uv = sphere(radius=0.5, nu=SPHERE_NU, nv=SPHERE_NV)
    b = _builder(res)
    b.use_bvh = True
    for p in _positions():
        b.add_mesh(v + np.asarray(p, np.float32), i, 1, normals=n, uvs=uv)
    return b.finalize()


def bench(make, res=256, spp=4, depth=3):
    import jax
    from grail.engine.render import render, auto_spp_chunk
    from grail.engine.integrator import IntegratorConfig
    t0 = time.perf_counter()
    scene, meta = make(res)
    build_s = time.perf_counter() - t0
    cfg = IntegratorConfig(kind="path", max_depth=depth)
    chunk = auto_spp_chunk(meta, spp)
    _, film = render(scene, meta, cfg, spp=min(chunk, spp))
    jax.block_until_ready(film)
    t0 = time.perf_counter()
    _, film = render(scene, meta, cfg, spp=spp)
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    return {"rays_per_sec": round(res * res * spp / dt, 1),
            "build_s": round(build_s, 1)}


def main():
    out = {"n_instances": N_INST, "tris_per_object":
           int(2 * SPHERE_NU * (SPHERE_NV - 1))}
    out["instanced"] = bench(build_instanced)
    if os.environ.get("INSTBENCH_SKIP_FLAT", "0") != "1":
        out["flattened"] = bench(build_flattened)
        out["ratio_flat_over_inst"] = round(
            out["flattened"]["rays_per_sec"]
            / max(out["instanced"]["rays_per_sec"], 1e-9), 2)
    print(json.dumps(out))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
