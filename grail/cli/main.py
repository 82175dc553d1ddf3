"""CLI — pbrt src/main/pbrt.cpp: parse scene file(s), render, write the image.

Usage: python -m grail.cli.main [options] scene.pbrt [scene2.pbrt ...]
       python -m grail.cli.main --outfile out.exr --quick scene.pbrt
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="grail",
                                 description="TPU-native pbrt-compatible renderer")
    ap.add_argument("scenes", nargs="+", help=".pbrt scene files ('-' = stdin)")
    ap.add_argument("--outfile", default=None, help="override output image path")
    ap.add_argument("--quick", action="store_true",
                    help="1/4 samples for fast previews (pbrt --quick)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--spp", type=int, default=None, help="override samples/pixel")
    ap.add_argument("--ncores", type=int, default=0, help="accepted for pbrt "
                    "compatibility (parallelism is device-mesh based)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="checkpoint file: resumed if present, written every "
                         "--checkpoint-every waves (SURVEY §5.4)")
    ap.add_argument("--checkpoint-every", type=int, default=8, metavar="N")
    ap.add_argument("--metrics", default=None, metavar="PATH",
                    help="append per-wave JSONL metrics (rays/s, wall time)")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else
        (logging.ERROR if args.quiet else logging.INFO),
        format="grail: %(levelname)s: %(message)s")
    log = logging.getLogger("grail")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..scene.parser import parse_file, parse_string
    from ..engine.render import render
    from ..engine.imageio import write_image

    for scene_path in args.scenes:
        t0 = time.time()
        try:
            if scene_path == "-":
                scene, meta, api = parse_string(sys.stdin.read())
            else:
                scene, meta, api = parse_file(scene_path)
        except (OSError, ValueError) as e:
            log.error("%s: %s", scene_path, e)
            return 1
        log.info("parsed %s: %d tris, %d lights, %d materials (%.1fs)",
                 scene_path, meta.n_tris, meta.n_lights,
                 scene["materials"]["lobe_type"].shape[0], time.time() - t0)

        spp = args.spp if args.spp else meta.sampler.spp
        if args.quick:
            spp = max(1, spp // 4)
        cfg = api.integrator_config

        if getattr(api, "probe_bake", None):
            # createprobes.cpp: bake SH radiance probes, write the grid file
            import numpy as np
            from ..engine.prt import bake_probes, write_probes
            pb = api.probe_bake
            v = np.asarray(scene["verts"])
            extent = np.maximum(v.max(0) - v.min(0), 1e-6)
            res = tuple(int(np.clip(np.ceil(e / pb["spacing"]), 1, 16))
                        for e in extent)
            probes = bake_probes(scene, meta, cfg, *res,
                                 n_samples=pb["nsamples"], lmax=pb["lmax"])
            write_probes(pb["filename"], probes)
            log.info("wrote %s (%dx%dx%d probes, lmax=%d)", pb["filename"],
                     *res, pb["lmax"])
            continue

        if getattr(api, "surfacepoints_out", None):
            # surfacepoints.cpp: dump the sampled point cloud as a float file
            import numpy as np
            from ..engine.subsurface import sample_surface_points
            sp = api.surfacepoints_out
            p, n, area = sample_surface_points(scene, sp["npoints"])
            with open(sp["filename"], "w") as f:
                f.write("# grail surface points: x y z nx ny nz area\n")
                for row in np.concatenate(
                        [np.asarray(p), np.asarray(n),
                         np.asarray(area)[:, None]], axis=1):
                    f.write(" ".join(f"{x:.9g}" for x in row) + "\n")
            log.info("wrote %s (%d points)", sp["filename"], sp["npoints"])
            continue

        if getattr(api, "mlt_config", None) is not None:
            from ..engine.metropolis import render_mlt
            t0 = time.time()
            n_waves = max(1, (meta.xres * meta.yres * api.mlt_spp)
                          // (api.mlt_config.n_chains
                              * api.mlt_config.mutations_per_wave))
            img, film = render_mlt(scene, meta, api.mlt_config,
                                   n_waves=n_waves)
            log.info("MLT rendered %dx%d (%d waves) in %.1fs", meta.xres,
                     meta.yres, n_waves, time.time() - t0)
            out = args.outfile or api.out_filename
            import numpy as np
            write_image(out, np.asarray(img))
            log.info("wrote %s", out)
            continue

        t0 = time.time()
        done = [0]

        def progress(s, total):
            if not args.quiet and (s % max(1, total // 20) == 0 or s == total):
                log.info("  wave %d/%d (%.1fs)", s, total, time.time() - t0)

        adaptive = getattr(api, "adaptive", None)
        if adaptive:
            from ..engine.render import render_adaptive
            img, _ = render_adaptive(scene, meta, cfg,
                                     min_spp=min(adaptive["min"], spp),
                                     max_spp=spp, progress=progress)
        else:
            img, film = render(scene, meta, cfg, spp=spp, progress=progress,
                               checkpoint_path=args.checkpoint,
                               checkpoint_every=args.checkpoint_every,
                               metrics_path=args.metrics)
        log.info("rendered %dx%d @ %dspp in %.1fs", meta.xres, meta.yres, spp,
                 time.time() - t0)

        out = args.outfile or api.out_filename
        import numpy as np
        write_image(out, np.asarray(img))
        log.info("wrote %s", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
