"""Benchmark: path-tracing rays/s on the available device.

Scenes: the Cornell box (BASELINE config 1/2; brute-force intersection), the
100k-triangle textured terrain + environment light (config 3; SAH BVH +
Pallas streaming traversal), and — unless BENCH_SKIP_1M=1 — the 1M-triangle
DOF+motion-blur scene (config 4; clustered stream tables). Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline", ...extras} including
per-bounce occupancy and the coherent/incoherent traversal micro rows.

Outage-proofing (round-4 verdict weak #1). Two measured failure modes of the
experimental axon TPU tunnel shape this harness:
  (a) the tunnel itself faults for spells (20-40 min documented windows);
  (b) once ANY op faults, the in-process JAX client is WEDGED — every later
      op in that process fails even after the tunnel recovers (verified this
      session: the faulting upload succeeds immediately from a fresh
      process while the original process keeps failing).
So every phase runs in its OWN SUBPROCESS (fresh client each attempt; the
persistent compilation cache makes re-runs cheap), retried with exponential
backoff sized to ride out a ~40 min outage, and each phase's result is
flushed to BENCH_partial.json the moment it lands — a fault can cost at most
one phase, never the recording. The final line stamps the run config
(res/spp/depth/env) and the provenance of the vs_baseline denominator.

The reference (pbrt-v2) publishes no numbers (BASELINE.md), so vs_baseline
compares the primary metric against the previous round's recording; on a
config mismatch it still reports the ratio but flags
"previous_config_mismatch": true.
"""
import glob
import json
import os
import re
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

_HERE = os.path.dirname(os.path.abspath(__file__))
PARTIAL_PATH = os.path.join(_HERE, "BENCH_partial.json")
_RESULTS = {}


def _flush_partial():
    tmp = PARTIAL_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(_RESULTS, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, PARTIAL_PATH)


def _record(key, value):
    _RESULTS[key] = value
    _flush_partial()


# --------------------------------------------------------------- phase bodies
# Each runs inside its own subprocess and prints one JSON object to stdout.

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
    return round(meta.xres * meta.yres * spp / dt, 1)


def _phase_cornell(env):
    from grail.scene.presets import cornell_box
    return {"cornell_rays_per_sec": _bench_scene(
        lambda: cornell_box(xres=env["res"], yres=env["res"], spp=env["spp"]),
        env["spp"], env["max_depth"])}


def _phase_mesh100k(env):
    from grail.scene.presets import mesh_scene
    return {"mesh100k_rays_per_sec": _bench_scene(
        lambda: mesh_scene(xres=env["res"], yres=env["res"], spp=env["spp"]),
        env["spp"], env["max_depth"])}


def _phase_mesh1m(env):
    from grail.scene.presets import mesh_scene_1m
    return {"mesh1m_rays_per_sec": _bench_scene(
        lambda: mesh_scene_1m(xres=env["res"], yres=env["res"], spp=4),
        4, env["max_depth"])}


def _phase_micro(env, n=1 << 20):
    """Coherent vs incoherent closest-hit rows on the 100k terrain (both
    coherence regimes recorded). Iterations chain through a data dependency
    so the experimental async dispatch cannot slip a launch past the timer."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from grail.scene.presets import mesh_scene
    from grail.kernels.intersect import _stream_bvh

    scene, _, _ = mesh_scene(xres=64, yres=64, spp=1, grid=224)
    verts = np.asarray(scene["verts"])
    bmin, bmax = verts.min(0), verts.max(0)
    rng = np.random.RandomState(1)
    o_i = jnp.asarray((rng.rand(n, 3) * (bmax - bmin) * 1.2
                       + bmin - 0.1 * (bmax - bmin)).astype(np.float32))
    d_np = rng.randn(n, 3).astype(np.float32)
    d_i = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
    res = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(bmin[0], bmax[0], res),
                         np.linspace(bmin[2], bmax[2], res))
    tgt = np.stack([xs.ravel(), np.zeros(res * res), ys.ravel()], -1)
    o_c = np.tile(np.array([0, bmax[1] + 6.0, 0], np.float32), (res * res, 1))
    d_c = tgt - o_c
    d_c = jnp.asarray((d_c / np.linalg.norm(d_c, axis=1, keepdims=True)
                       ).astype(np.float32))
    o_c = jnp.asarray(o_c)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)
    out = {}
    for name, o, d, sort in (("coherent", o_c, d_c, False),
                             ("incoherent", o_i, d_i, True)):
        f = jax.jit(lambda o, d, s=sort: _stream_bvh(scene, o, d, tmax, tmin,
                                                     sort=s))
        r = jax.block_until_ready(f(o, d))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            o = o + 0.0 * r["t"][:, None]
            r = f(o, d)
        jax.block_until_ready(r)
        out[f"bvh_{name}_mrays_per_sec"] = round(
            n * iters / (time.perf_counter() - t0) / 1e6, 2)
    return out


def _phase_occupancy(env):
    from grail.scene.presets import mesh_scene
    from grail.engine.render import occupancy_probe
    from grail.engine.integrator import IntegratorConfig
    scene_m, meta_m, _ = mesh_scene(xres=128, yres=128, spp=1)
    occ = occupancy_probe(scene_m, meta_m,
                          IntegratorConfig(kind="path",
                                           max_depth=env["max_depth"]))
    return {"mesh_occupancy_per_bounce": occ}


PHASES = {
    "cornell": _phase_cornell,
    "mesh100k": _phase_mesh100k,
    "micro": _phase_micro,
    "occupancy": _phase_occupancy,
    "mesh1m": _phase_mesh1m,
}


# ------------------------------------------------------------ orchestration

def _run_phase_subprocess(name, attempts=8, wait=45, factor=1.7, cap=600):
    """Run one phase in a fresh subprocess (fresh TPU client per attempt)."""
    last = ""
    for i in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", name],
                capture_output=True, text=True, timeout=1800, cwd=_HERE)
            if p.returncode == 0:
                for line in reversed(p.stdout.strip().splitlines()):
                    line = line.strip()
                    if line.startswith("{"):
                        return json.loads(line)
                last = "no JSON in phase output"
            else:
                last = (p.stderr or p.stdout or "")[-400:]
        except subprocess.TimeoutExpired:
            last = "phase subprocess timed out (1800s)"
        except Exception as e:          # noqa: BLE001
            last = str(e)[:400]
        sys.stderr.write(f"[bench] phase {name} attempt {i + 1}/{attempts} "
                         f"failed: {last[-200:]}\n")
        sys.stderr.flush()
        if i + 1 < attempts:
            time.sleep(min(wait * factor ** i, cap))
    raise RuntimeError(f"phase {name} failed after {attempts} attempts: "
                       f"{last[-300:]}")


def _previous():
    """Most recent BENCH_r*.json whose primary value parsed (handles r1/r01
    naming and driver 'parsed' wrapping). Returns (value, round, config)."""
    best = None
    best_n = -1
    for p in glob.glob(os.path.join(_HERE, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        n = int(m.group(1))
        if n > best_n:
            try:
                with open(p) as f:
                    j = json.load(f)
                inner = j if "value" in j else j.get("parsed", {})
                v = inner.get("value")
                if v:
                    best, best_n = (v, inner.get("config")), n
            except Exception:
                pass
    if best is None:
        return None, None, None
    return best[0], best_n, best[1]


def main():
    env = {"res": int(os.environ.get("BENCH_RES", "256")),
           "spp": int(os.environ.get("BENCH_SPP", "16")),
           "max_depth": int(os.environ.get("BENCH_DEPTH", "5"))}

    if "--phase" in sys.argv:
        name = sys.argv[sys.argv.index("--phase") + 1]
        print(json.dumps(PHASES[name](env)))
        return

    config = {**env, "env": {k: v for k, v in os.environ.items()
                             if k.startswith("BENCH_")}}
    _record("config", config)

    names = ["cornell", "mesh100k", "micro", "occupancy"]
    if os.environ.get("BENCH_SKIP_1M", "0") != "1":
        names.append("mesh1m")
    for name in names:
        try:
            for k, v in _run_phase_subprocess(name).items():
                _record(k, v)
        except Exception as e:          # noqa: BLE001
            _record(name + "_error", str(e)[:300])

    # committed one-off benchmark artifacts, surfaced (clearly marked) so the
    # round recording carries them: the instanced-vs-flattened ratio and the
    # traversal-variant sweep are measured by their own scripts
    for key, path in (("instanced_artifact", "benchmarks/instbench_r05.json"),
                      ("stream_variants_artifact",
                       "benchmarks/streamvariants_r05.json")):
        try:
            with open(os.path.join(_HERE, path)) as f:
                _record(key, json.load(f))
        except Exception:
            pass

    cornell_rps = _RESULTS.get("cornell_rays_per_sec")
    prev, prev_round, prev_cfg = _previous()
    vs = (cornell_rps / prev) if (prev and cornell_rps) else 1.0
    line = {
        "metric": "camera_rays_per_sec_path_cornell",
        "value": cornell_rps if cornell_rps else 0.0,
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "previous_round": prev_round,
        "previous_value": prev,
    }
    if prev_cfg is not None and prev_cfg != config:
        line["previous_config_mismatch"] = True
        line["previous_config"] = prev_cfg
    for k, v in _RESULTS.items():
        if k not in line:
            line[k] = v
    print(json.dumps(line))


if __name__ == "__main__":
    main()
