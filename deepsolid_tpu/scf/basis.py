"""Built-in Gaussian basis sets (no Basis Set Exchange dependency).

STO-3G is generated from the universal STO-3G expansion of Slater
orbitals: exponents at zeta=1 scale as zeta^2 per shell, contraction
coefficients are shell-universal (Hehre, Stewart & Pople, JCP 51, 2657
(1969)). Supported elements: Z = 1..10 (covers the reference bench
systems H / Li / C; the table is trivially extensible).

Replaces the role of PySCF's basis machinery for the native SCF
(reference couples to PySCF via hf.py:26 and cell.basis).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from deepsolid_tpu.system import elements

# Universal STO-3G expansions at zeta = 1: (exponents, coefficients)
_STO3G_1S = (
    np.array([2.227660584, 0.405771156, 0.109818036]),
    np.array([0.154328967, 0.535328142, 0.444634542]),
)
_STO3G_2SP_EXP = np.array([0.994203966, 0.231030314, 0.075138623])
_STO3G_2S_COEF = np.array([-0.099967229, 0.399512826, 0.700115469])
_STO3G_2P_COEF = np.array([0.155916275, 0.607683719, 0.391957393])

# Standard STO-3G Slater exponents per element: {Z: (zeta_1s, zeta_2sp)}
_STO3G_ZETA = {
    1: (1.24, None),
    2: (1.69, None),
    3: (2.69, 0.80),
    4: (3.68, 1.15),
    5: (4.68, 1.50),
    6: (5.67, 1.72),
    7: (6.67, 1.95),
    8: (7.66, 2.25),
    9: (8.65, 2.55),
    10: (9.64, 2.88),
}


@dataclasses.dataclass(frozen=True)
class Shell:
    """One contracted CARTESIAN shell; primitives normalized to the
    axis-aligned component (x^l): off-axis cartesians (xy, ...) then
    carry their natural relative weights — absorbed by the overlap
    metric in the generalized eigenproblem, so only conditioning (not
    correctness) depends on this choice."""

    l: int
    exponents: np.ndarray
    coefficients: np.ndarray  # contraction over NORMALIZED primitives
    atom_index: int
    center: np.ndarray

    @property
    def nfunc(self) -> int:
        return (self.l + 1) * (self.l + 2) // 2  # cartesian: s 1, p 3, d 6


def primitive_norm(alpha: np.ndarray, l: int) -> np.ndarray:
    """Unit-overlap norm of the axis-aligned cartesian Gaussian
    x^l exp(-a r^2), any l: (2a/pi)^{3/4} (4a)^{l/2} / sqrt((2l-1)!!)."""
    dfact = 1.0
    for m in range(2 * l - 1, 0, -2):
        dfact *= m
    return (2.0 * alpha / np.pi) ** 0.75 * (4.0 * alpha) ** (l / 2.0) / np.sqrt(dfact)


def sto3g_shells_for_atom(z: int) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    """[(l, exponents, coefficients)] for element Z (coeffs over normalized
    primitives)."""
    if z not in _STO3G_ZETA:
        raise NotImplementedError(
            f"sto-3g built-in table covers Z=1..10; got Z={z}"
        )
    zeta1, zeta2 = _STO3G_ZETA[z]
    shells = [(0, _STO3G_1S[0] * zeta1**2, _STO3G_1S[1].copy())]
    if zeta2 is not None:
        exp2 = _STO3G_2SP_EXP * zeta2**2
        shells.append((0, exp2, _STO3G_2S_COEF.copy()))
        shells.append((1, exp2.copy(), _STO3G_2P_COEF.copy()))
    return shells


def build_shells(cell, basis: str = "sto-3g",
                 exp_to_discard: float = 0.1) -> List[Shell]:
    """Contracted shells for every atom of a cell.

    `exp_to_discard` drops primitives more diffuse than the cutoff — the
    standard practice for periodic GTO bases (every reference config sets
    cell.exp_to_discard = 0.1, e.g. config/diamond.py:31); diffuse
    primitives are near-linearly-dependent across cells and blow up the
    lattice sums.
    """
    name = basis.lower().replace("_", "-")
    if name not in ("sto-3g", "sto3g", "minimal", ""):
        raise NotImplementedError(
            f"built-in bases: sto-3g (got {basis!r}); pass explicit shells "
            "or extend scf/basis.py"
        )
    shells = []
    for ia, (sym, xyz) in enumerate(zip(cell.atom_symbols, cell.atom_coords)):
        z = elements.symbol_to_number(sym)
        for l, exps, coefs in sto3g_shells_for_atom(z):
            keep = np.asarray(exps) >= (exp_to_discard or 0.0)
            if not np.any(keep):
                continue
            shells.append(
                Shell(
                    l=l,
                    exponents=np.asarray(exps, np.float64)[keep],
                    coefficients=np.asarray(coefs, np.float64)[keep],
                    atom_index=ia,
                    center=np.asarray(xyz, np.float64),
                )
            )
    return shells


def num_ao(shells: List[Shell]) -> int:
    return sum(s.nfunc for s in shells)
