"""exravg — pbrt src/tools/exravg.cpp: print the mean pixel value of image(s)."""
from __future__ import annotations

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from ..engine.imageio import read_image
    for path in argv:
        img = read_image(path)
        print(f"{path}: {float(np.asarray(img).mean()):.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
