"""gcmiipy_tpu: a TPU-native atmospheric stencil solver.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
marthinwurer/gcmiipy: the GISS GCM-II style primitive-equation dynamical
core on an Arakawa C-grid with sigma coordinates, Matsuno time stepping,
polar filtering, flux-limited transport and grey-gas column physics —
built for jit/scan/shard_map over TPU device meshes.
"""

__version__ = "0.1.0"
