"""Robust-kernel weights and chi-square constants.

Matches the reference's g2o usage: Huber kernel with delta = sqrt(5.991)
(mono) / sqrt(7.815) (stereo) and chi2 outlier thresholds 5.991 / 7.815
(reference src/Optimizer.cc:141-142, 514-517).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% quantile, 2 DoF
CHI2_STEREO = 7.815  # 95% quantile, 3 DoF


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel, as a function of the squared
    (information-weighted) error.  w = 1 inside, delta/|e| outside."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, delta / e)
