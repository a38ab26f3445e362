"""pyhmmer_tpu — a TPU-native profile HMM search engine.

A from-scratch reimplementation of the capability surface of
`pyhmmer <https://github.com/althonos/pyhmmer>`_ (HMMER3) designed for
TPU hardware: batched JAX/Pallas DP kernels, pjit/shard_map data
parallelism over device meshes, and pure-Python bio I/O.
"""

__version__ = "0.1.0"

from . import easel
from . import plan7

__all__ = ["easel", "plan7", "__version__"]
