"""transformer4sed_tpu — TPU-native sound event detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
cai525/Transformer4SED (MAT-SED, PMAM, DASM): Transformer-based sound
event detection with masked-reconstruction pretraining, mean-teacher
semi-supervised fine-tuning, prototype-based masked audio modelling and
open-vocabulary query-based detection.

Design principles (TPU-first):
  * All compute paths are pure functions under ``jax.jit`` with static
    shapes; raggedness (event decoding, metrics) lives on the host.
  * Randomness is explicit: every stochastic op takes a ``jax.random``
    key.
  * Scale-out is SPMD via ``jax.sharding.Mesh`` + ``jax.jit`` with
    sharding annotations; no replicate/scatter/gather wrappers.
  * Hot ops (log-mel frontend, band-diagonal attention, median filter)
    have Pallas TPU kernels with XLA fallbacks.
"""

__version__ = "0.1.0"
