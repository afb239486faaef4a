"""deepsolid_tpu: a TPU-native neural-network VMC framework for real solids.

A ground-up JAX/XLA/Pallas implementation of periodic neural-network
variational Monte Carlo with the capabilities of bytedance/DeepSolid
(see SURVEY.md): a complex, Bloch-phased FermiNet-style ansatz for 3-D
periodic supercells, Ewald Hamiltonian, Metropolis-Hastings sampling,
a complex-aware KFAC natural-gradient optimizer, Hartree-Fock-style
pretraining against native orbital sources, and data-parallel training
over `jax.sharding.Mesh` device meshes.

Design differences from the reference (intentional, TPU-first):
  * `jit` + `shard_map` over a named Mesh instead of `pmap`.
  * Serializable dataclass cells instead of live PySCF objects in config.
  * Explicitly registered KFAC layer taps instead of jaxpr graph matching.
  * A forward-Laplacian engine for the kinetic energy instead of the
    reference's loop-over-tangents ladder (still available as fallbacks).
  * fp32-first numerics with compensated/fp64 reductions where needed
    (TPU fp64 is emulated and slow).
"""

__version__ = "0.1.0"
