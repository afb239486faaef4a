"""Periodic complex FermiNet-style wavefunction for solids (TPU-native).

The ansatz (same physics as the reference, new implementation):
  periodic nu/tri input features -> two-stream permutation-equivariant MLP
  -> per-spin complex orbital heads -> multiplicative envelopes -> Bloch
  phase factors e^{i k.r} from the occupied k-list -> log-sum-exp over
  determinants.

Reference semantics: DeepSolid/network.py:60-667. Differences by design:
  * Static system geometry lives in a serializable `SystemSpec` (numpy),
    not a live PySCF cell.
  * Every dense layer is *explicitly named and tapped*: the forward can
    record layer inputs and accept additive output perturbations, which is
    what the native KFAC implementation consumes (no jaxpr graph matching).
  * All heads share one forward; heads are selected per call, not baked
    into separate network objects.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepsolid_tpu.models import envelopes as envelopes_lib
from deepsolid_tpu.models import features as features_lib
from deepsolid_tpu.ops.slogdet import logdet_matmul
from deepsolid_tpu.system.cell import Supercell

ParamTree = Any


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Architecture hyperparameters (reference: base_config.py:128-139)."""

    hidden_dims: Tuple[Tuple[int, int], ...] = ((256, 32), (256, 32), (256, 32))
    determinants: int = 8
    envelope_type: str = "isotropic"
    bias_orbitals: bool = False
    use_last_layer: bool = False
    full_det: bool = False
    distance_type: str = "nu"

    def __post_init__(self):
        hd = tuple(tuple(h) for h in self.hidden_dims)
        object.__setattr__(self, "hidden_dims", hd)
        if self.distance_type == "tri" and self.envelope_type != "isotropic":
            raise ValueError(
                "tri features provide 6-dim relative coords; only the "
                "isotropic envelope is defined for them"
            )


@dataclasses.dataclass(frozen=True)
class SystemSpec:
    """Static (host/numpy) system geometry closed over by the network."""

    atoms: np.ndarray  # (natom, 3) primitive-cell atom positions
    spins: Tuple[int, int]  # (nalpha, nbeta) in the simulation cell
    prim_lattice: np.ndarray
    prim_av: np.ndarray
    prim_bv: np.ndarray
    sim_lattice: np.ndarray
    sim_av: np.ndarray
    sim_bv: np.ndarray
    klist: Tuple[np.ndarray, ...]  # occupied k-vectors per spin channel

    @classmethod
    def from_supercell(cls, sc: Supercell, klist: Sequence[np.ndarray]) -> "SystemSpec":
        prim = sc.prim
        return cls(
            atoms=np.asarray(prim.atom_coords),
            spins=tuple(sc.nelec),
            prim_lattice=prim.lattice,
            prim_av=prim.AV,
            prim_bv=prim.BV,
            sim_lattice=sc.lattice,
            sim_av=sc.AV,
            sim_bv=sc.BV,
            klist=tuple(np.asarray(k) for k in klist),
        )

    @property
    def nelectron(self) -> int:
        return sum(self.spins)

    @property
    def active_spins(self) -> Tuple[int, ...]:
        return tuple(s for s in self.spins if s > 0)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def dense(
    x: jnp.ndarray,
    layer_params: Dict[str, jnp.ndarray],
    name: str,
    eps: Optional[Dict[str, jnp.ndarray]] = None,
    taps: Optional[Dict[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """A named dense layer with KFAC tap/perturbation hooks.

    y = x @ w (+ b) (+ eps[name]); records taps[name] = x when capturing.
    Equivalent role to the reference's tagged `linear_layer`
    (network.py:430-446) without custom JAX primitives.
    """
    y = x @ layer_params["w"]
    if "b" in layer_params:
        y = y + layer_params["b"]
    if eps is not None and name in eps:
        y = y + eps[name]
    if taps is not None:
        taps[name] = x
    return y


def construct_symmetric_features(
    h_one: jnp.ndarray, h_two: jnp.ndarray, spins: Tuple[int, int]
) -> jnp.ndarray:
    """Permutation-equivariant mixing of one- and two-electron streams.

    Row i of the output is the concatenation of
      [ h_one[i],
        per-spin-channel means of h_one        (broadcast to every i),
        per-spin-channel means over j of h_two[j, i] ],
    so same-spin permutations act trivially on everything except h_one[i]
    itself. Empty spin channels contribute nothing.
    Reference semantics: network.py:305-332.
    """
    nelec = h_one.shape[0]
    channels = [(0, spins[0]), (spins[0], spins[0] + spins[1])]
    channels = [(lo, hi) for lo, hi in channels if hi > lo]
    chan_one = [
        jnp.broadcast_to(jnp.mean(h_one[lo:hi], axis=0), (nelec, h_one.shape[1]))
        for lo, hi in channels
    ]
    chan_two = [jnp.mean(h_two[lo:hi], axis=0) for lo, hi in channels]
    return jnp.concatenate([h_one, *chan_one, *chan_two], axis=1)


def eval_phases(
    x: jnp.ndarray,
    klist: Sequence[jnp.ndarray],
    spins: Tuple[int, int],
    full_det: bool,
) -> List[jnp.ndarray]:
    """Bloch phase factors e^{i k.r} per spin channel.

    Reference semantics: network.py:449-458.
    """
    pos = x.reshape(-1, 3)
    xs = jnp.split(pos, [spins[0]], axis=0)
    ks = [jnp.asarray(k, pos.dtype) for k in klist]
    if full_det:
        kall = jnp.concatenate(ks, axis=0)
        kdots = [xs_s @ kall.T for xs_s, ne in zip(xs, spins) if ne > 0]
    else:
        kdots = [xs_s @ k.T for xs_s, k, ne in zip(xs, ks, spins) if ne > 0]
    return [jnp.exp(1j * kd) for kd in kdots]


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------


def init_params(
    key: jnp.ndarray,
    spec: SystemSpec,
    cfg: NetworkConfig,
    dtype=None,
) -> ParamTree:
    """Random initialization (reference semantics: network.py:60-186)."""
    dtype = dtype or jnp.zeros(0).dtype
    natom = spec.atoms.shape[0]
    in_one, in_two = features_lib.input_feature_dims(natom, cfg.distance_type)
    spins = spec.spins
    active = spec.active_spins
    nchannels = len(active)

    dims_one_in = [(nchannels + 1) * in_one + nchannels * in_two] + [
        (nchannels + 1) * h[0] + nchannels * h[1] for h in cfg.hidden_dims
    ]
    if not cfg.use_last_layer:
        dims_one_in[-1] = cfg.hidden_dims[-1][0]
    dims_one_out = [h[0] for h in cfg.hidden_dims]
    dims_two = [in_two] + [h[1] for h in cfg.hidden_dims]
    len_double = (
        len(cfg.hidden_dims) if cfg.use_last_layer else len(cfg.hidden_dims) - 1
    )

    params = {
        "single": [],
        "double": [],
        "orbital": [],
        "envelope": [],
    }

    for i in range(len(cfg.hidden_dims)):
        key, k1, k2 = jax.random.split(key, 3)
        params["single"].append(
            {
                "w": jax.random.normal(
                    k1, (dims_one_in[i], dims_one_out[i]), dtype
                ) / jnp.sqrt(float(dims_one_in[i])).astype(dtype),
                "b": jax.random.normal(k2, (dims_one_out[i],), dtype),
            }
        )
        if i < len_double:
            key, k3, k4 = jax.random.split(key, 3)
            params["double"].append(
                {
                    "w": jax.random.normal(
                        k3, (dims_two[i], dims_two[i + 1]), dtype
                    ) / jnp.sqrt(float(dims_two[i])).astype(dtype),
                    "b": jax.random.normal(k4, (dims_two[i + 1],), dtype),
                }
            )

    for spin in active:
        nparam = (
            sum(spins) * cfg.determinants if cfg.full_det else spin * cfg.determinants
        )
        key, k5 = jax.random.split(key)
        orb = {
            "w": jax.random.normal(k5, (dims_one_in[-1], 2 * nparam), dtype)
            / jnp.sqrt(float(dims_one_in[-1])).astype(dtype)
        }
        if cfg.bias_orbitals:
            key, k6 = jax.random.split(key)
            orb["b"] = jax.random.normal(k6, (2 * nparam,), dtype)
        params["orbital"].append(orb)
        params["envelope"].append(
            envelopes_lib.init_envelope_params(natom, nparam, cfg.envelope_type, dtype)
        )

    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def orbital_matrices(
    params: ParamTree,
    x: jnp.ndarray,
    spec: SystemSpec,
    cfg: NetworkConfig,
    eps: Optional[Dict[str, jnp.ndarray]] = None,
    taps: Optional[Dict[str, jnp.ndarray]] = None,
) -> List[jnp.ndarray]:
    """Forward pass up to the (phase-dressed) orbital matrices.

    Returns one (ndet, n, n) complex matrix when full_det, else one
    (ndet, n_s, n_s) per active spin channel.
    Reference semantics: network.py:461-560.
    """
    spins = spec.spins
    active = spec.active_spins

    ae_rel, ee_rel, r_ae, r_ee = features_lib.periodic_input_features(
        x,
        spec.atoms,
        prim_lattice=spec.prim_lattice,
        prim_av=spec.prim_av,
        prim_bv=spec.prim_bv,
        sim_lattice=spec.sim_lattice,
        sim_av=spec.sim_av,
        sim_bv=spec.sim_bv,
        distance_type=cfg.distance_type,
    )
    n = r_ae.shape[0]
    h_one = jnp.concatenate([r_ae, ae_rel], axis=2).reshape(n, -1)
    h_two = jnp.concatenate([r_ee, ee_rel], axis=2)
    to_env = r_ae if cfg.envelope_type == "isotropic" else ae_rel
    envelope_fn = envelopes_lib.ENVELOPES[cfg.envelope_type]

    def residual(old, new):
        return (old + new) / jnp.sqrt(jnp.asarray(2.0, new.dtype)) \
            if old.shape == new.shape else new

    n_double = len(params["double"])
    for i in range(n_double):
        h_one_in = construct_symmetric_features(h_one, h_two, spins)
        h_one_next = jnp.tanh(
            dense(h_one_in, params["single"][i], f"single_{i}", eps, taps)
        )
        h_two_next = jnp.tanh(
            dense(h_two, params["double"][i], f"double_{i}", eps, taps)
        )
        h_one = residual(h_one, h_one_next)
        h_two = residual(h_two, h_two_next)

    if n_double != len(params["single"]):
        h_one_in = construct_symmetric_features(h_one, h_two, spins)
        i = len(params["single"]) - 1
        h_one_next = jnp.tanh(
            dense(h_one_in, params["single"][i], f"single_{i}", eps, taps)
        )
        h_one = residual(h_one, h_one_next)
        h_to_orbitals = h_one
    else:
        h_to_orbitals = construct_symmetric_features(h_one, h_two, spins)

    h_split = jnp.split(h_to_orbitals, [spins[0]], axis=0)
    h_split = [h for h in h_split if h.size > 0]
    to_env_split = jnp.split(to_env, [spins[0]], axis=0)
    to_env_split = [t for t in to_env_split if t.size > 0]

    orbitals = []
    for i, spin in enumerate(active):
        raw = dense(h_split[i], params["orbital"][i], f"orbital_{i}", eps, taps)
        nparam = raw.shape[-1] // 2
        orb = raw[..., :nparam] + 1j * raw[..., nparam:]
        if cfg.envelope_type == "full":
            env = envelope_fn(
                to_env_split[i], params["envelope"][i],
                name=f"envelope_{i}", eps=eps, taps=taps,
            )
        else:
            env = envelope_fn(to_env_split[i], params["envelope"][i])
        orb = env * orb
        norb = sum(spins) if cfg.full_det else spin
        orb = orb.reshape(spin, cfg.determinants, norb).transpose(1, 0, 2)
        orbitals.append(orb)

    phases = eval_phases(x, spec.klist, spins, cfg.full_det)
    orbitals = [o * p[None, :, :] for o, p in zip(orbitals, phases)]
    if cfg.full_det:
        orbitals = [jnp.concatenate(orbitals, axis=1)]
    return orbitals


def apply_network(
    params: ParamTree,
    x: jnp.ndarray,
    spec: SystemSpec,
    cfg: NetworkConfig,
    method: str = "slogdet",
    eps: Optional[Dict[str, jnp.ndarray]] = None,
    taps: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Evaluate the wavefunction head `method` at one electron configuration.

    Heads (reference: network.py:563-606):
      'slogdet'          -> log|psi|                  (real)
      'logdet'           -> log psi                   (complex)
      'phase_and_slogdet'-> (psi/|psi|, log|psi|)
      'mats'             -> orbital matrices
    """
    orbitals = orbital_matrices(params, x, spec, cfg, eps=eps, taps=taps)
    if method == "mats":
        return orbitals
    phase, slog = logdet_matmul(orbitals)
    if method == "slogdet":
        return slog
    if method == "logdet":
        return jnp.log(phase) + slog
    if method == "phase_and_slogdet":
        return phase, slog
    raise ValueError(f"Unknown method: {method}")


@dataclasses.dataclass(frozen=True)
class Network:
    """Bundled init/apply with per-head conveniences and KFAC layer metadata."""

    spec: SystemSpec
    cfg: NetworkConfig

    def init(self, key, dtype=None) -> ParamTree:
        return init_params(key, self.spec, self.cfg, dtype=dtype)

    # single-walker heads -----------------------------------------------------
    def slogdet(self, params, x):
        return apply_network(params, x, self.spec, self.cfg, "slogdet")

    def logdet(self, params, x):
        return apply_network(params, x, self.spec, self.cfg, "logdet")

    def phase_and_slogdet(self, params, x):
        return apply_network(params, x, self.spec, self.cfg, "phase_and_slogdet")

    def orbitals(self, params, x):
        return apply_network(params, x, self.spec, self.cfg, "mats")

    # batched heads -----------------------------------------------------------
    @functools.cached_property
    def batch_slogdet(self):
        return jax.vmap(self.slogdet, in_axes=(None, 0), out_axes=0)

    @functools.cached_property
    def batch_logdet(self):
        return jax.vmap(self.logdet, in_axes=(None, 0), out_axes=0)

    @functools.cached_property
    def batch_orbitals(self):
        return jax.vmap(self.orbitals, in_axes=(None, 0), out_axes=0)

    # KFAC hooks ---------------------------------------------------------------
    def logdet_with_taps(self, params, x, eps=None):
        """(log psi, taps) for one walker, with output perturbations eps."""
        taps: Dict[str, jnp.ndarray] = {}
        out = apply_network(
            params, x, self.spec, self.cfg, "logdet", eps=eps, taps=taps
        )
        return out, taps

    def layer_registry(self, params) -> Dict[str, Dict[str, Any]]:
        """name -> {'path': pytree path tuple, 'has_bias': bool} for KFAC."""
        reg = {}
        for i, layer in enumerate(params["single"]):
            reg[f"single_{i}"] = {"path": ("single", i), "has_bias": "b" in layer}
        for i, layer in enumerate(params["double"]):
            reg[f"double_{i}"] = {"path": ("double", i), "has_bias": "b" in layer}
        for i, layer in enumerate(params["orbital"]):
            reg[f"orbital_{i}"] = {"path": ("orbital", i), "has_bias": "b" in layer}
        return reg

    def envelope_registry(self, params) -> Dict[str, Dict[str, Any]]:
        """Full-envelope sigma params with per-atom Kronecker KFAC blocks
        (reference analog: QmcBlockedDense via qmc1_tag,
        curvature_tags_and_blocks.py:56-132). Empty unless
        envelope_type == 'full'."""
        if self.cfg.envelope_type != "full":
            return {}
        reg = {}
        for i in range(len(params["envelope"])):
            reg[f"envelope_{i}"] = {"path": ("envelope", i, "sigma")}
        return reg


def make_network(supercell: Supercell, klist, cfg: Optional[NetworkConfig] = None,
                 **cfg_kwargs) -> Network:
    """Build a `Network` for a simulation supercell and occupied k-list."""
    cfg = cfg or NetworkConfig(**cfg_kwargs)
    spec = SystemSpec.from_supercell(supercell, klist)
    return Network(spec=spec, cfg=cfg)
