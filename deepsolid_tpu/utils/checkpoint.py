"""Checkpoint save/restore (npz with pickled pytrees).

Reference semantics: DeepSolid/checkpoint.py:44-165, with one deliberate
upgrade: walker data is stored as a single global (batch, 3N) array, so a
restore onto a different device count ELASTICALLY reshards instead of
erroring (the reference hard-requires an identical device count,
checkpoint.py:157-160).
"""

from __future__ import annotations

import datetime
import logging
import os
import pickle
import zipfile
from typing import Optional

import jax
import numpy as np


def find_last_checkpoint(ckpt_path: Optional[str] = None) -> Optional[str]:
    """Most recent readable checkpoint in a directory (skips corrupt files)."""
    if ckpt_path and os.path.exists(ckpt_path):
        files = [f for f in os.listdir(ckpt_path) if "qmcjax_ckpt_" in f]
        for f in sorted(files, reverse=True):
            fname = os.path.join(ckpt_path, f)
            try:
                with open(fname, "rb") as fh:
                    np.load(fh, allow_pickle=True)
                return fname
            except (OSError, EOFError, ValueError, zipfile.BadZipFile,
                    pickle.UnpicklingError):
                continue
    return None


def create_save_path(save_path: Optional[str]) -> str:
    if not save_path:
        timestamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        save_path = os.path.join(os.getcwd(), f"deepsolid_tpu_{timestamp}")
    os.makedirs(save_path, exist_ok=True)
    return save_path


def get_restore_path(restore_path: Optional[str] = None) -> Optional[str]:
    return restore_path or None


def _as_object_scalar(tree):
    """Wrap an arbitrary pytree in a 0-d object array so np.savez can store
    it (tuples of namedtuples are not array-coercible directly)."""
    host = jax.tree_util.tree_map(np.asarray, tree) if tree is not None else None
    out = np.empty((), dtype=object)
    out[()] = host
    return out


def save(save_path: str, t: int, data, params, opt_state, mcmc_width) -> str:
    """Write qmcjax_ckpt_{t}.npz. `data` is the global walker batch."""
    ckpt = os.path.join(save_path, f"qmcjax_ckpt_{t:06d}.npz")
    with open(ckpt, "wb") as f:
        np.savez(
            f,
            t=t,
            data=np.asarray(data),
            params=_as_object_scalar(params),
            opt_state=_as_object_scalar(opt_state),
            mcmc_width=np.asarray(mcmc_width) if mcmc_width is not None else None,
        )
    return ckpt


def restore(restore_filename: str, batch_size: Optional[int] = None):
    """Returns (t, data, params, opt_state, mcmc_width).

    `data` comes back as a global (batch, 3N) numpy array; callers reshard
    onto whatever mesh is current.
    """
    with open(restore_filename, "rb") as f:
        ckpt = np.load(f, allow_pickle=True)
        t = ckpt["t"].tolist() + 1  # iterations completed
        data = ckpt["data"]
        if data.ndim > 2:  # tolerate per-device-stacked layouts
            data = data.reshape(-1, data.shape[-1])
        params = ckpt["params"].tolist()
        opt_state = ckpt["opt_state"].tolist()
        mcmc_width = ckpt["mcmc_width"].tolist()
        if batch_size and data.shape[0] != batch_size:
            # elastic batch resize: tile (or truncate) the walker axis.
            # The optimizer/param state is batch-independent. The reference
            # hard-errors here (checkpoint.py:157-160) — resizing keeps
            # restarts elastic across batch sizes as well as device counts.
            # Tiled COPIES beyond the first are jittered (sigma from the
            # equilibrated proposal width when available) so the restored
            # batch carries no exactly-duplicated walkers, and the first
            # post-restore statistics are only correlated, not degenerate;
            # a warning reminds the user to let the chain re-equilibrate.
            n = data.shape[0]
            if batch_size > n:
                logging.warning(
                    "Elastic restore: growing the walker batch %d -> %d by "
                    "jittered tiling; statistics are correlated until the "
                    "chain re-equilibrates (a few MCMC adaptation windows).",
                    n, batch_size,
                )
            reps = -(-batch_size // n)
            tiled = np.tile(data, (reps, 1))[:batch_size]
            if batch_size > n:
                width = mcmc_width if np.ndim(mcmc_width) == 0 else None
                sigma = 0.3 * float(width) if width else 1e-2
                rng = np.random.default_rng(t)
                tiled[n:] = tiled[n:] + sigma * rng.standard_normal(
                    tiled[n:].shape
                ).astype(tiled.dtype)
            data = tiled
    return t, data, params, opt_state, mcmc_width
