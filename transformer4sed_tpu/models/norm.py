"""BatchNorm with exact torch running-statistics semantics.

flax's ``nn.BatchNorm`` differs from ``torch.nn.BatchNorm2d`` in two
ways that matter for training parity with the reference:

1. **Momentum convention is inverted**: torch's ``momentum`` is the
   weight on the NEW batch statistic
   (``running = (1 - m) * running + m * batch``), flax's is the weight
   on the OLD running average. The reference CRNN stack uses
   ``nn.BatchNorm2d(eps=0.001, momentum=0.99)``
   (``src/models/cnn/base.py:75``, ``FDY_cnn.py:153``) — i.e. the
   running stats track the latest batch almost exactly — while the
   ResNet / FDY-attention / HTSAT ``bn0`` layers use the torch default
   ``momentum=0.1``.
2. **The running variance is updated with the UNBIASED batch variance**
   (Bessel-corrected), while normalization uses the biased one
   (torch ``_BatchNorm`` docs; ATen ``batch_norm_update_stats``). flax
   tracks the biased variance.

``RefBatchNorm`` reproduces the torch behavior and keeps flax's
``batch_stats`` collection layout (``mean`` / ``var``) and parameter
names (``scale`` / ``bias``) so the torch checkpoint converters and the
existing state-threading code are unaffected. ``momentum`` here uses
the TORCH convention.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class RefBatchNorm(nn.Module):
    """torch-semantics BatchNorm over the trailing feature axis.

    Normalizes over every axis except the last (matching how the model
    code uses flax ``nn.BatchNorm`` on NHWC / NTC layouts).
    """

    use_running_average: bool = True
    momentum: float = 0.1  # torch convention: weight on the NEW batch stat
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = int(np.prod([x.shape[a] for a in axes]))
            mean = jnp.mean(xf, axis=axes)
            # biased variance normalizes the batch ...
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                # ... the UNBIASED one feeds the running average
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (xf - mean) / jnp.sqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)
