"""P6 scene sharding: ring ray-passing over spatial triangle shards
(dist/scene_shard.py) must reproduce the replicated render bitwise —
SURVEY §2.10 P6 / §5.7, the >HBM-scene axis."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grail.scene.presets import cornell_box
from grail.engine.render import render
from grail.engine.integrator import IntegratorConfig
from grail.dist.sharding import make_mesh, render_scene_sharded
from grail.dist.scene_shard import partition_scene, ring_intersect


def test_partition_covers_all_triangles():
    scene, meta, _ = cornell_box(xres=16, yres=16, spp=1)
    ring = partition_scene(scene, 8)
    gid = np.asarray(ring["gid"]).ravel()
    real = np.sort(gid[gid < 2 ** 30])
    assert (real == np.arange(meta.n_tris)).all()
    # shards are gid-sorted (argmin tie-break parity with intersect_brute);
    # pad entries (gid 2^30) sit at the end
    g = np.asarray(ring["gid"])
    for row in g:
        real_row = row[row < 2 ** 30]
        assert (np.diff(real_row) > 0).all()
        assert (row[len(real_row):] == 2 ** 30).all()


def test_ring_intersect_matches_brute():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from grail.kernels.intersect import intersect_brute

    scene, meta, _ = cornell_box(xres=16, yres=16, spp=1)
    ring = partition_scene(scene, 8)
    rng = np.random.RandomState(3)
    n = 512
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
                    + np.array([0, 1, 0], np.float32))
    d = rng.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmax = jnp.full((n,), 1e7, jnp.float32)

    ref = jax.tree.map(np.asarray, intersect_brute(scene, o, d, tmax))

    mesh = make_mesh()

    def fn(ring_shard, o, d, tmax):
        local = {k: v[0] for k, v in ring_shard.items()}
        hit = ring_intersect(local, o, d, tmax)
        return {k: hit[k] for k in ("t", "prim", "b1", "b2")}

    out = shard_map(fn, mesh=mesh,
                    in_specs=(P("dev"), P("dev"), P("dev"), P("dev")),
                    out_specs=P("dev"), check_vma=False)(ring, o, d, tmax)
    out = jax.tree.map(np.asarray, out)
    assert (out["prim"] == ref["prim"]).all()
    hitm = ref["prim"] >= 0
    assert (out["t"][hitm] == ref["t"][hitm]).all()      # bitwise
    assert (out["b1"][hitm] == ref["b1"][hitm]).all()

    # occlusion variant
    def fnp(ring_shard, o, d, tmax):
        local = {k: v[0] for k, v in ring_shard.items()}
        return ring_intersect(local, o, d, tmax, any_hit=True)["occluded"]
    occ = shard_map(fnp, mesh=mesh,
                    in_specs=(P("dev"), P("dev"), P("dev"), P("dev")),
                    out_specs=P("dev"), check_vma=False)(ring, o, d, tmax)
    assert (np.asarray(occ) == (ref["prim"] >= 0)).all()


def test_scene_sharded_render_matches_replicated():
    scene, meta, _ = cornell_box(xres=16, yres=16, spp=2)
    cfg = IntegratorConfig(kind="path", max_depth=3, compact=False)
    img1, _ = render(scene, meta, cfg, spp=2)
    mesh = make_mesh()
    img8, _ = render_scene_sharded(scene, meta, cfg, spp=2, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img8))


def test_ring_stream_local_step_matches_replicated():
    """Ring step 2: per-shard Pallas stream tables (interpret mode on CPU)
    must reproduce the replicated render — per-device geometry O(T/D) AND
    O(log T/D) per-shard work. Tolerance is tight-allclose rather than
    bitwise: the stream traversal keeps the first-visited among
    exact-equal-t hits instead of the brute argmin's lowest-gid convention."""
    import os
    scene, meta, _ = cornell_box(xres=16, yres=16, spp=2)
    cfg = IntegratorConfig(kind="path", max_depth=3, compact=False)
    img_rep, _ = render(scene, meta, cfg, spp=2)
    os.environ["GRAIL_PALLAS_INTERPRET"] = "1"
    try:
        img_ring, _ = render_scene_sharded(scene, meta, cfg, spp=2,
                                           mesh=make_mesh(8), stream=True)
    finally:
        os.environ.pop("GRAIL_PALLAS_INTERPRET", None)
    a, b = np.asarray(img_rep), np.asarray(img_ring)
    assert a.mean() > 1e-3
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-4)
