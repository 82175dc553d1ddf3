"""ReadFloatFile — pbrt src/core/floatfile.{h,cpp}: whitespace-separated numbers
with #-comments (used for .spd spectra and SH probe files)."""
from __future__ import annotations


def read_float_file(path):
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0]
            for tok in line.split():
                vals.append(float(tok))
    return vals
