"""Package the Witherden–Vincent symmetric quadrature rule tables.

The rules are the published tables from

    Witherden, F.D. and Vincent, P.E., "On the identification of symmetric
    quadrature rules for finite element methods", Comput. Math. Appl. 69 (2015).

as distributed in expanded text form (one `x [y [z]] w` row per point, file
name `{strength}-{npoints}.txt`).  This script parses a directory tree of such
files (domain subdirectories tri/quad/tet/hex/pri/pyr) and packs them into a
single compressed ``.npz`` consumed by :mod:`fenris_tpu.quadrature.polyquad`.

Usage:
    python tools/gen_polyquad_data.py <rules_dir> <out.npz>

The reference implementation embeds the same tables via build-time codegen
(see fenris-quadrature/build.rs in the upstream reference); we pack them as
binary arrays instead.
"""

import sys
from pathlib import Path

import numpy as np

DOMAIN_DIMS = {"tri": 2, "quad": 2, "tet": 3, "hex": 3, "pri": 3, "pyr": 3}


def main(rules_dir: str, out_path: str) -> None:
    root = Path(rules_dir)
    arrays = {}
    index = {}
    for domain, dim in DOMAIN_DIMS.items():
        entries = []
        for path in sorted((root / domain).glob("*.txt")):
            strength, npoints = (int(s) for s in path.stem.split("-"))
            data = np.loadtxt(path, dtype=np.float64, ndmin=2)
            assert data.shape == (npoints, dim + 1), (path, data.shape)
            key = f"{domain}/{strength}-{npoints}"
            arrays[key + "/points"] = np.ascontiguousarray(data[:, :dim])
            arrays[key + "/weights"] = np.ascontiguousarray(data[:, dim])
            entries.append((strength, npoints))
        index[domain] = np.array(sorted(entries), dtype=np.int64)
    for domain, entries in index.items():
        arrays[f"{domain}/index"] = entries
    np.savez_compressed(out_path, **arrays)
    total = sum(len(v) for k, v in arrays.items() if k.endswith("weights"))
    print(f"packed {total} quadrature points -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
