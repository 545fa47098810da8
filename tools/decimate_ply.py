"""Subsample a 3DGS PLY for committing as a repo artifact (full files are
~180 MB; regenerate them with demo.py). Keeps the highest-opacity N splats."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from vicasplat_tpu.utils.ply import export_ply, read_ply


def main(src, dst, n=50000):
    g = read_ply(src)
    order = np.argsort(-g["opacities"])[: int(n)]
    kept = export_ply(
        g["means"][order], g["scales"][order], g["rotations"][order],
        g["harmonics"][order], g["opacities"][order], dst,
    )
    print(f"{src} -> {dst}: kept {kept} of {len(g['means'])}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
