"""3-channel linear-RGB spectra as trailing-dim-3 arrays.

Counterpart of include/mitsuba/core/spectrum.h with SPECTRUM_SAMPLES=3
(the reference's default build). A "Spectrum" here is just an array whose
last axis has size 3; all arithmetic is plain jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

N_CHANNELS = 3

# ITU-R BT.709 luminance weights (spectrum.h getLuminance for RGB builds).
_LUM = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)


def luminance(s):
    return jnp.sum(s * _LUM, axis=-1)


def is_zero(s):
    return jnp.all(s == 0.0, axis=-1)


def smax(s):
    """Spectrum::max() — max across channels."""
    return jnp.max(s, axis=-1)


def gray(x):
    """Scalar -> uniform spectrum."""
    x = jnp.asarray(x, dtype=jnp.float32)
    return jnp.broadcast_to(x[..., None], x.shape + (N_CHANNELS,))
