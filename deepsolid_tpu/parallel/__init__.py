from deepsolid_tpu.parallel.mesh import (
    DATA_AXIS,
    DERIV_AXIS,
    all_mean,
    all_sum,
    local_mesh,
    make_mesh,
    pmean_if_axis,
    psum_if_axis,
    shard_leading,
    replicate,
)

__all__ = [
    "DATA_AXIS",
    "DERIV_AXIS",
    "all_mean",
    "all_sum",
    "local_mesh",
    "make_mesh",
    "pmean_if_axis",
    "psum_if_axis",
    "shard_leading",
    "replicate",
]
