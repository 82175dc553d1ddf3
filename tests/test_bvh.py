"""BVH fuzz + structural tests — the aggregatetest renderer analog (pbrt
src/renderers/aggregatetest.cpp): random rays vs brute-force exhaustive oracle.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grail.scene.bvh import build_bvh, bvh_to_device, validate_bvh
from grail.scene.presets import tessellate_sphere, cornell_box
from grail.kernels.intersect import intersect_brute, intersect_p_brute
from grail.kernels.bvh_traverse import bvh_intersect, bvh_intersect_p


def _random_mesh(seed, ntris=200):
    rs = np.random.RandomState(seed)
    centers = rs.randn(ntris, 1, 3) * 2.0
    tris = centers + rs.randn(ntris, 3, 3) * 0.3
    verts = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * ntris, dtype=np.int64).reshape(-1, 3)
    return verts, idx


def _mini_scene(verts, idx):
    scene = {
        "verts": jnp.asarray(verts),
        "tri_idx": jnp.asarray(idx.astype(np.int32)),
    }
    scene["bvh"] = bvh_to_device(build_bvh(verts, idx))
    return scene


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bvh_matches_bruteforce(seed):
    verts, idx = _random_mesh(seed)
    scene = _mini_scene(verts, idx)
    validate_bvh({k: np.asarray(v) for k, v in scene["bvh"].items()}, verts, idx)

    rs = np.random.RandomState(seed + 100)
    n = 512
    o = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 4.0)
    d = rs.randn(n, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmax = jnp.full((n,), 1e7, jnp.float32)

    h_ref = jax.jit(intersect_brute)(scene, o, d, tmax)
    h_bvh = jax.jit(bvh_intersect)(scene, o, d, tmax)

    hit_ref = np.asarray(h_ref["prim"]) >= 0
    hit_bvh = np.asarray(h_bvh["prim"]) >= 0
    np.testing.assert_array_equal(hit_ref, hit_bvh)
    # same nearest hit (t agreement; prim may differ on exact ties)
    np.testing.assert_allclose(np.asarray(h_ref["t"])[hit_ref],
                               np.asarray(h_bvh["t"])[hit_ref], rtol=1e-5)
    agree = (np.asarray(h_ref["prim"]) == np.asarray(h_bvh["prim"]))[hit_ref]
    assert agree.mean() > 0.99

    occ_ref = np.asarray(jax.jit(intersect_p_brute)(scene, o, d, tmax))
    occ_bvh = np.asarray(jax.jit(bvh_intersect_p)(scene, o, d, tmax))
    np.testing.assert_array_equal(occ_ref, occ_bvh)


def test_bvh_sphere_mesh():
    verts, idx = tessellate_sphere(radius=1.0, nu=24, nv=12)
    scene = _mini_scene(verts, idx)
    n = 256
    rs = np.random.RandomState(7)
    # rays from outside aimed at the sphere: all must hit with t ≈ dist-1
    o = rs.randn(n, 3)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 5.0
    d = -o / 5.0
    h = jax.jit(bvh_intersect)(scene, jnp.asarray(o.astype(np.float32)),
                               jnp.asarray(d.astype(np.float32)),
                               jnp.full((n,), 1e7, jnp.float32))
    assert (np.asarray(h["prim"]) >= 0).all()
    np.testing.assert_allclose(np.asarray(h["t"]), 4.0, atol=0.05)


def test_cornell_with_forced_bvh_matches_brute():
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig
    from grail.scene.presets import cornell_box

    scene, meta, b = cornell_box(xres=16, yres=16, spp=2)
    assert scene["bvh"] is None  # 36 tris → brute
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    img_brute, _ = render(scene, meta, cfg, spp=2)

    b.use_bvh = True
    scene2, meta2 = b.finalize()
    assert scene2["bvh"] is not None
    img_bvh, _ = render(scene2, meta2, cfg, spp=2)
    np.testing.assert_allclose(np.asarray(img_brute), np.asarray(img_bvh),
                               atol=1e-4)


def test_native_builder_matches_numpy():
    """grail/native C++ builder: identical flattened topology to the NumPy
    reference builder (same SAH decisions), and passes validate_bvh."""
    import numpy as np
    from grail.scene.bvh import build_bvh, validate_bvh
    from grail.native import build_bvh_native, available
    if not available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    T = 3000
    verts = (rng.random((T * 3, 3)) * 8).astype(np.float32)
    tris = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    c = verts[tris].mean(1, keepdims=True)
    verts[tris.reshape(-1)] = (c + (verts[tris] - c) * 0.1).reshape(-1, 3)
    bn = build_bvh_native(verts, tris)
    bp = build_bvh(verts, tris)
    validate_bvh(bn, verts, tris)
    for k in ("right", "prim_off", "nprims", "axis", "prim_ids"):
        np.testing.assert_array_equal(bn[k], bp[k])
    np.testing.assert_allclose(bn["bounds_min"], bp["bounds_min"], rtol=1e-6)
    np.testing.assert_allclose(bn["bounds_max"], bp["bounds_max"], rtol=1e-6)


def test_stream_traversal_matches_brute():
    """Pallas ordered sub-packet streaming traversal (interpret mode on CPU)
    vs exhaustive oracle — the aggregatetest criterion applied to the TPU
    kernel. Covers closest-hit, any-hit, finite segments, and non-block-
    multiple ray counts (padding)."""
    import numpy as np
    import jax.numpy as jnp
    from grail.scene.bvh import build_bvh
    from grail.kernels.bvh_stream import build_stream_table, _run
    from grail.kernels.intersect import intersect_brute, intersect_p_brute

    rng = np.random.default_rng(3)
    T = 300
    verts = (rng.random((T * 3, 3)) * 6).astype(np.float32)
    tris = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    c = verts[tris].mean(1, keepdims=True)
    verts[tris.reshape(-1)] = (c + (verts[tris] - c) * 0.3).reshape(-1, 3)
    scene = {"verts": jnp.asarray(verts), "tri_idx": jnp.asarray(tris)}
    bvh_np = build_bvh(verts, tris, max_prims=4, force_leaf=4)
    table = jnp.asarray(build_stream_table(bvh_np, verts, tris))
    n = 1024 + 100   # non-multiple of the 1024-ray block: exercises padding
    o = jnp.asarray(rng.random((n, 3)).astype(np.float32) * 6)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)

    t, prim, b1, b2 = _run(table, o, d, tmin, tmax, interpret=True)
    ref = intersect_brute(scene, o, d, tmax)
    hit = np.asarray(prim) >= 0
    hit_ref = np.asarray(ref["prim"]) >= 0
    assert (hit == hit_ref).all()
    ok = hit & hit_ref
    np.testing.assert_allclose(np.asarray(t)[ok], np.asarray(ref["t"])[ok],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(prim)[ok] == np.asarray(ref["prim"])[ok]).all()

    # any-hit, full range and finite segments
    _, prim_a, _, _ = _run(table, o, d, tmin, tmax, any_hit=True,
                           interpret=True)
    occ_ref = np.asarray(intersect_p_brute(scene, o, d, tmax))
    assert ((np.asarray(prim_a) >= 0) == occ_ref).all()
    tmax2 = jnp.full((n,), 2.0, jnp.float32)
    _, prim_b, _, _ = _run(table, o, d, tmin, tmax2, any_hit=True,
                           interpret=True)
    occ2_ref = np.asarray(intersect_p_brute(scene, o, d, tmax2))
    assert ((np.asarray(prim_b) >= 0) == occ2_ref).all()

    # stackless skip-link kernel (record field 10): same hits as the ordered
    # stack kernel for BOTH traversal kinds — only the visit order differs
    t_s, prim_s, _, _ = _run(table, o, d, tmin, tmax, interpret=True,
                             kind="skip")
    assert ((np.asarray(prim_s) >= 0) == hit_ref).all()
    np.testing.assert_allclose(np.asarray(t_s)[ok], np.asarray(ref["t"])[ok],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(prim_s)[ok] == np.asarray(ref["prim"])[ok]).all()
    _, prim_sa, _, _ = _run(table, o, d, tmin, tmax2, any_hit=True,
                            interpret=True, kind="skip")
    assert ((np.asarray(prim_sa) >= 0) == occ2_ref).all()


def test_clustered_stream_matches_brute():
    """Clustered record tables (scene > VMEM wall): per-cluster traversal +
    min-t merge with cross-cluster tmax tightening must equal the exhaustive
    oracle — the dispatch logic of kernels/intersect._stream_bvh['cstream']
    exercised in interpret mode with a tiny cluster target."""
    import numpy as np
    import jax.numpy as jnp
    from grail.scene.bvh import build_bvh
    from grail.kernels.bvh_stream import build_clustered_stream, _run
    from grail.kernels.intersect import intersect_brute, intersect_p_brute

    rng = np.random.default_rng(11)
    T = 3000
    verts = (rng.random((T * 3, 3)) * 6).astype(np.float32)
    tris = np.arange(T * 3, dtype=np.int32).reshape(T, 3)
    c = verts[tris].mean(1, keepdims=True)
    verts[tris.reshape(-1)] = (c + (verts[tris] - c) * 0.3).reshape(-1, 3)
    scene = {"verts": jnp.asarray(verts), "tri_idx": jnp.asarray(tris)}

    ctab = build_clustered_stream(verts, tris, build_bvh, target=700)
    assert ctab.shape[0] >= 4      # really multiple clusters

    # every global prim id appears exactly once across cluster tri records
    ids = []
    for ci in range(ctab.shape[0]):
        recs = ctab[ci].reshape(-1, 16)
        meta = recs[:, 9].astype(np.int64)
        tri_rows = (meta & 4) > 0
        # zero-pad rows also have meta 0 (box, right=0); real box records of
        # cluster roots never collide with tri detection (bit 4)
        ids.append(meta[tri_rows] >> 3)
    ids = np.sort(np.concatenate(ids))
    assert (ids == np.arange(T)).all()

    n = 2048 + 77
    o = jnp.asarray(rng.random((n, 3)).astype(np.float32) * 6)
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)

    BIG = jnp.float32(3.0e37)
    t = jnp.full((n,), BIG)
    prim = jnp.full((n,), -1, jnp.int32)
    for ci in range(ctab.shape[0]):
        cut = jnp.minimum(tmax, t)
        tc, pc, _, _ = _run(jnp.asarray(ctab[ci]), o, d, tmin, cut,
                            interpret=True)
        closer = (pc >= 0) & (tc < t)
        t = jnp.where(closer, tc, t)
        prim = jnp.where(closer, pc, prim)

    ref = intersect_brute(scene, o, d, tmax)
    hit = np.asarray(prim) >= 0
    hit_ref = np.asarray(ref["prim"]) >= 0
    assert (hit == hit_ref).all()
    ok = hit & hit_ref
    np.testing.assert_allclose(np.asarray(t)[ok], np.asarray(ref["t"])[ok],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(prim)[ok] == np.asarray(ref["prim"])[ok]).mean() > 0.999

    # any-hit with early-kill across clusters
    occ = jnp.zeros((n,), bool)
    for ci in range(ctab.shape[0]):
        tmax_c = jnp.where(occ, jnp.float32(-3.0e37), tmax)
        _, pa, _, _ = _run(jnp.asarray(ctab[ci]), o, d, tmin, tmax_c,
                           any_hit=True, interpret=True)
        occ = occ | (pa >= 0)
    occ_ref = np.asarray(intersect_p_brute(scene, o, d, tmax))
    assert (np.asarray(occ) == occ_ref).all()
