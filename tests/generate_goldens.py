"""Regenerate the golden images for tests/test_golden.py (CPU backend, so the
goldens match what CI renders). Usage:
    JAX_PLATFORMS=cpu python tests/generate_goldens.py [scene-name ...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
from test_golden import SCENES, GOLDEN_DIR, render_scene  # noqa: E402


def regen_mlt_reference():
    """Re-render the 192-spp path reference for the MLT caustic validation
    (the independent estimator committed as goldens/mlt_path_reference.exr;
    see test_render.py::test_mlt_caustic_scene_matches_long_path_reference)."""
    import numpy as np
    from grail.scene.parser import parse_file
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig
    from grail.engine.imageio import write_image
    root = os.path.join(os.path.dirname(__file__), os.pardir)
    scene, meta, _ = parse_file(os.path.join(root, "scenes", "mlt.pbrt"))
    img, _ = render(scene, meta,
                    IntegratorConfig(kind="path", max_depth=5), spp=192)
    out = os.path.join(GOLDEN_DIR, "mlt_path_reference.exr")
    write_image(out, np.asarray(img))
    print(f"mlt_path_reference: mean={np.asarray(img).mean():.4f} -> {out}")


def main():
    if "--mlt-reference" in sys.argv:
        regen_mlt_reference()
        return
    names = sys.argv[1:] or sorted(SCENES)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from grail.engine.imageio import write_image
    for name in names:
        import time
        t0 = time.time()
        img = render_scene(name)
        out = os.path.join(GOLDEN_DIR, name + ".exr")
        write_image(out, img)
        print(f"{name}: {img.shape} mean={img.mean():.4f} "
              f"({time.time() - t0:.1f}s) -> {out}")


if __name__ == "__main__":
    main()
