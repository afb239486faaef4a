"""Generate + cache ET-DZ tables for the 3d row (Z = 21..30).

Each element's even-tempered-bath atomic UHF costs hours of single-core
ERI time (nao ~ 130 with a 10-primitive d bath), so this driver runs
serially, skips elements whose cache already exists, and prints the bath
energy vs the approximate numerical-HF limit as each lands. Tables are
committed to deepsolid_tpu/scf/_etdz_cache/ as they are produced.

Usage: python runs/gen_etdz_3d.py [Z ...]   (default: 21..30)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

APPROX_NHF = {
    21: -759.735718, 22: -848.405997, 23: -942.884338, 24: -1043.356376,
    25: -1149.866252, 26: -1262.443665, 27: -1381.414553, 28: -1506.870908,
    29: -1638.963742, 30: -1777.848116,
}


def main():
    from deepsolid_tpu.scf import etdz

    zs = [int(a) for a in sys.argv[1:]] or list(range(21, 31))
    for z in zs:
        path = etdz._cache_path(z)
        if os.path.exists(path):
            e = etdz.bath_energy(z)
            print(f"Z={z}: cached, e_bath={e}", flush=True)
            continue
        t0 = time.time()
        etdz.dz_shells_for_atom(z)
        e = etdz.bath_energy(z)
        ref = APPROX_NHF.get(z)
        diff = None if (e is None or ref is None) else e - ref
        print(
            f"Z={z}: e_bath={e:.6f} Ha  vs approx limit {ref}  "
            f"diff={diff if diff is None else round(diff * 1e3, 2)} mHa  "
            f"({time.time() - t0:.0f} s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
