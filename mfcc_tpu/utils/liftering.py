"""Cepstral liftering (software/lift.py:12-26, notebook MFCC.ipynb cell 43)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lifter(cepstra, L: int = 22):
    """1 + (L/2) sin(pi*n/L) scaling of the cepstral coefficients; L<=0 is a
    no-op.  Works on numpy or jax arrays, last axis = coefficients."""
    if L <= 0:
        return cepstra
    xp = jnp if isinstance(cepstra, jnp.ndarray) else np
    n = xp.arange(cepstra.shape[-1])
    return cepstra * (1 + (L / 2.0) * xp.sin(xp.pi * n / L))
