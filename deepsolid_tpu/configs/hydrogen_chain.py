"""Hydrogen chain supercell (reference: config/hydrogen_chain.py).

input_str: "symbol,Sx,Sy,Sz,L,spin,basis" e.g. "H,10,1,1,3.6,0,ccpvdz".
"""

import numpy as np

from deepsolid_tpu import config as base_config
from deepsolid_tpu.system import Atom, Cell, make_supercell


def get_config(input_str):
    symbol, sx, sy, sz, L, spin, basis = input_str.split(",")
    S = np.diag([int(sx), int(sy), int(sz)])
    L = float(L)
    cell = Cell.from_atoms(
        [Atom(symbol, (L / 2, 0.0, 0.0))],
        np.diag([L, 100.0, 100.0]),
        spin=int(spin),
    )
    cfg = base_config.default()
    cfg.system.cell = make_supercell(cell, S)
    cfg.system.basis = basis
    return cfg
