"""Generate the small binary assets the golden corpus scenes reference.

Run once from the repo root; outputs are committed under scenes/assets/.
    python scenes/gen_assets.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from grail.engine.imageio import write_pfm  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def main():
    os.makedirs(OUT, exist_ok=True)

    # projection-light slide: a 16x16 colored window grid
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w]
    slide = np.zeros((h, w, 3), np.float32)
    slide[..., 0] = ((xx // 4 + yy // 4) % 2).astype(np.float32)
    slide[..., 1] = (xx / (w - 1.0)).astype(np.float32)
    slide[..., 2] = (yy / (h - 1.0)).astype(np.float32)
    write_pfm(os.path.join(OUT, "slide.pfm"), slide)

    # goniometric distribution: bright equator band, dark poles (lat-long)
    h, w = 16, 32
    t = (np.arange(h) + 0.5) / h * np.pi
    gonio = np.tile(np.sin(t)[:, None, None] ** 2, (1, w, 3)).astype(
        np.float32)
    write_pfm(os.path.join(OUT, "gonio.pfm"), gonio)

    # bump displacement map: raised bubbles
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w] / 31.0
    bump = (0.04 * np.sin(xx * 6 * np.pi) * np.sin(yy * 6 * np.pi)).astype(
        np.float32)
    write_pfm(os.path.join(OUT, "bumps.pfm"),
              np.repeat(bump[..., None], 3, -1))

    # irregular isotropic .brdf: a soft glossy-red measured lobe
    lines = ["3", "450", "550", "650"]
    rng = np.random.RandomState(4)
    for ti in np.linspace(0.08, 1.45, 8):
        for to in np.linspace(0.08, 1.45, 8):
            for dp in np.linspace(0.0, np.pi, 7):
                # stronger near mirror configurations (ti≈to, dp≈pi)
                g = np.exp(-4.0 * ((ti - to) ** 2
                                   + 0.3 * (np.pi - dp) ** 2))
                r = 0.05 + 0.5 * g
                gch = 0.04 + 0.15 * g
                bch = 0.03 + 0.08 * g
                lines.append(
                    f"{ti:.4f} 0 {to:.4f} {dp:.4f} {bch:.4f} {gch:.4f} {r:.4f}")
    with open(os.path.join(OUT, "redglossy.brdf"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", sorted(os.listdir(OUT)))


if __name__ == "__main__":
    main()
