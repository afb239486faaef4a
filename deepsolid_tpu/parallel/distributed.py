"""Multi-host / pod bootstrap.

The reference ships a dead GPU-only coordinator bootstrap
(DeepSolid/distributed.py:28-55, never imported; multi-node explicitly
unsupported, README.md:92-94). The TPU-native replacement is the modern
`jax.distributed.initialize()` + a global mesh over all devices; walker
batches shard over hosts automatically through the 'data' axis because
every array in the training step is a global jax.Array.

On a pod slice this is all that's needed:

    from deepsolid_tpu.parallel import distributed
    distributed.initialize()          # no-op on a single host
    process.process(cfg)              # mesh spans the full slice
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from deepsolid_tpu.parallel.mesh import DATA_AXIS


def _already_initialized() -> bool:
    """Whether jax.distributed.initialize() has already run.

    Must NOT probe jax.process_count()/jax.devices(): those initialize the
    local backend, after which jax.distributed.initialize() raises. The
    distributed client handle is the only side-effect-free signal.
    """
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except (ImportError, AttributeError):  # pragma: no cover - jax internals moved
        return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (multi-host only).

    MUST run before anything touches the JAX backend (jax.devices(),
    jax.process_count(), any computation). With no arguments, TPU pod
    environments auto-discover everything; single-host runs are a no-op.
    Explicitly requested multi-host bootstrap (coordinator_address given)
    fails loudly rather than silently degrading to single-host.
    """
    explicit = coordinator_address is not None or num_processes is not None
    if _already_initialized():
        logging.info("jax.distributed already initialized; skipping")
    else:
        try:
            if explicit:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            else:
                # TPU metadata autodetection; harmless no-op on a single host
                jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            if explicit:
                raise RuntimeError(
                    "multi-host bootstrap was explicitly requested "
                    f"(coordinator_address={coordinator_address!r}, "
                    f"num_processes={num_processes!r}) but "
                    f"jax.distributed.initialize failed: {e}"
                ) from e
            logging.info("jax.distributed.initialize skipped: %s", e)
    logging.info(
        "distributed: %d processes, %d global devices",
        jax.process_count(), jax.device_count(),
    )


def global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """A 1-D data mesh over ALL devices in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))
