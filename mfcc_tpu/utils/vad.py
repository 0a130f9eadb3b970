"""Voice-activity metric (software/cepstrum.c:161-183).

The reference's host software computes sum(c0^2) over the central third of a
window of cepstral columns and compares against threshold 1e8 to decide if a
window contains voice.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DEFAULT_THRESHOLD = int(1e8)  # cepstrum.c:166


def voice_activity_power(cepstra) -> np.ndarray:
    """sum over the central third of frames of c0^2.

    cepstra: (..., frames, ncep).  Returns (...,) power values
    (cepstrum.c:168-176 iterates x in [len/3, 2*len/3) summing col[0]^2)."""
    xp = jnp if isinstance(cepstra, jnp.ndarray) else np
    n = cepstra.shape[-2]
    c0 = cepstra[..., n // 3: 2 * n // 3, 0].astype(
        jnp.int64 if xp is jnp else np.int64)
    return xp.sum(c0 * c0, axis=-1)


def has_voice(cepstra, threshold: int = DEFAULT_THRESHOLD):
    """power > threshold (cepstrum.c:178-182)."""
    return voice_activity_power(cepstra) > threshold
