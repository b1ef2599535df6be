"""recstudio_tpu: a TPU-native recommender-system framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ustcml/RecStudio: dataset ETL + static-shape input pipeline, sampler zoo,
loss/scorer libraries, a jit-compiled training engine, full-catalog
retrieval evaluation, and a model zoo spanning mf/seq/ae/fm/graph/kg/multitask
families. Compute runs on TPU via jax.jit/pjit with Pallas kernels for the
hot paths; multi-chip scaling uses jax.sharding meshes.
"""

__version__ = "0.1.0"

LOG_DIR = "./log/"
DEFAULT_CACHE_DIR = "~/.recstudio_tpu/cache"
