"""Regenerate the committed ET-DZ tables (scf/_etdz_cache) with the
round-3 bath (s cap 2000*zeta^2 @ ratio 2.1, p cap 6*z^2) that lands all
of Na..Ar within ~1 mHa of the numerical HF limits. Also drops any
stale UHF disk-cache entries for et-dz systems (the UHF cache is keyed
on the basis *name*, not the shell data)."""
import glob
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, "/root/repo")

from deepsolid_tpu.scf import etdz

for p in glob.glob(os.path.join(etdz._CACHE_DIR, "*.npz")):
    os.remove(p)
etdz._MEM_CACHE.clear()

for z in range(1, etdz.MAX_Z + 1):
    t0 = time.time()
    tabs = etdz.dz_shells_for_atom(z)
    logging.info("Z=%d: %d shells in %.1f s", z, len(tabs), time.time() - t0)
print("done")
