"""Multi-device SPMD paths on the 8-virtual-CPU mesh (SURVEY §4 multi-node answer)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grail.scene.presets import cornell_box
from grail.engine.render import render
from grail.engine.integrator import IntegratorConfig
from grail.dist.sharding import make_mesh, render_sharded, make_train_step


@pytest.fixture(scope="module")
def small():
    return cornell_box(xres=16, yres=16, spp=2)


def test_sharded_matches_single_device(small):
    scene, meta, _ = small
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    img1, _ = render(scene, meta, cfg, spp=2)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    img8, _ = render_sharded(scene, meta, cfg, spp=2, mesh=mesh)
    # counter-based RNG: identical sampling regardless of sharding → identical image
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img8), atol=2e-5)


def test_train_step_grads(small):
    scene, meta, _ = small
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    mesh = make_mesh()
    target = jnp.zeros((meta.yres, meta.xres, 3), jnp.float32)
    step = make_train_step(meta, cfg, mesh)
    loss, grads = step(scene, target, jnp.uint32(0))
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(grads["tex_data"]["const"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_distributed_photon_shoot_bitwise():
    """P3 distributed preprocess (SURVEY §2.10): photon shooting fanned out
    over the 8-device mesh — each device shoots a disjoint counter-stream
    slice, all_gathers, and rebuilds the grid — must equal the replicated
    shoot BITWISE (same counters → same photons, re-laid-out to the same
    depth-major order before the grid sort)."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from grail.scene.presets import cornell_box
    from grail.engine.photonmap import (shoot_photons, shoot_photons_sharded,
                                        PhotonConfig)
    from grail.dist.sharding import make_mesh

    scene, meta, _ = cornell_box(xres=8, yres=8, spp=1)
    pcfg = PhotonConfig(n_paths=2048, radius=0.3)
    rep = jax.jit(shoot_photons, static_argnums=(1, 2))(scene, meta, pcfg)

    mesh = make_mesh(8)
    fn = shard_map(lambda s: shoot_photons_sharded(s, meta, pcfg),
                   mesh=mesh, in_specs=(P(),), out_specs=P(),
                   check_vma=False)
    dist = jax.jit(fn)(scene)
    for k in rep:
        np.testing.assert_array_equal(np.asarray(rep[k]),
                                      np.asarray(dist[k]), err_msg=k)


def test_mlt_chains_sharded_matches_single_device():
    """P4 multi-chip Metropolis: the 8-device chain-sharded render advances
    the SAME chain trajectories as the single-device run (global-chain-id
    mutation keys), so the merged splat film matches up to float
    accumulation order."""
    import numpy as np
    from grail.scene.presets import cornell_box
    from grail.engine.metropolis import (MLTConfig, render_mlt,
                                         render_mlt_sharded)
    from grail.dist.sharding import make_mesh

    scene, meta, _ = cornell_box(xres=16, yres=16, spp=2, with_boxes=False)
    cfg = MLTConfig(max_depth=3, n_chains=1024, n_bootstrap=1024,
                    mutations_per_wave=4)
    img1, _ = render_mlt(scene, meta, cfg, n_waves=2)
    img8, _ = render_mlt_sharded(scene, meta, cfg, n_waves=2,
                                 mesh=make_mesh(8))
    a, b = np.asarray(img1), np.asarray(img8)
    assert np.isfinite(b).all() and a.mean() > 0
    np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-3)
