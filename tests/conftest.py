"""Test configuration: run everything on a virtual 8-device CPU mesh.

jax may already be imported by the interpreter environment
(sitecustomize), so env-var XLA flags are too late; instead force the
platform via jax.config before any backend initialisation. This also
keeps tests off the single real TPU chip (which is exclusive-access —
a second client would block).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
