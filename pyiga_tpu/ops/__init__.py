"""Device-side (JAX/XLA/Pallas) compute kernels for pyiga_tpu.

Submodules:

* :mod:`pyiga_tpu.ops.basis` — dense per-axis basis value/derivative tables.
* :mod:`pyiga_tpu.ops.geom` — geometry fields (values/Jacobians, det/inv) on
  tensor-product Gauss grids, evaluated on device.
* :mod:`pyiga_tpu.ops.sumfac` — sum-factorization assembly of the compact
  multilevel-banded data tensor (the TPU replacement for the reference's
  per-entry Cython assemblers).
* :mod:`pyiga_tpu.ops.mlmatvec` — matrix-free matvec on the compact tensor.
"""
