"""Quasi-Monte Carlo point sets.

Counterpart of the reference's sampler plugins (src/samplers/:
stratified, ldsampler, halton, hammersley, sobol, faure) and the QMC
infrastructure (src/libcore/qmc.cpp): radical inverses, Halton /
Hammersley sequences, a 2D Sobol sequence and stratified jitter, as
pure functions producing sample arrays that any renderer can feed in
place of uniform threefry draws (e.g. pixel antialiasing jitter in the
progressive driver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37], np.int64)


def radical_inverse(base: int, index):
    """Van der Corput radical inverse of `index` in `base` (qmc.cpp).
    Fixed digit count (enough for 32-bit indices) so it vectorizes."""
    index = jnp.asarray(index, jnp.int32)
    n_digits = int(np.ceil(32 / np.log2(base)))
    inv_base = 1.0 / base

    def body(_, carry):
        i, result, f = carry
        digit = i % base
        return (i // base, result + digit * f, f * inv_base)

    _, result, _ = jax.lax.fori_loop(
        0, n_digits, body,
        (index, jnp.zeros(index.shape, jnp.float32),
         jnp.full(index.shape, inv_base, jnp.float32)),
    )
    return result


def halton(n: int, dims: int = 2, offset: int = 0):
    """(n, dims) Halton points (halton.cpp)."""
    idx = jnp.arange(offset, offset + n)
    cols = [radical_inverse(int(PRIMES[d]), idx) for d in range(dims)]
    return jnp.stack(cols, axis=-1)


def hammersley(n: int, dims: int = 2):
    """(n, dims) Hammersley set: first dim = i/n (hammersley.cpp)."""
    idx = jnp.arange(n)
    cols = [(idx + 0.5) / n]
    cols += [radical_inverse(int(PRIMES[d]), idx) for d in range(dims - 1)]
    return jnp.stack(cols, axis=-1).astype(jnp.float32)


def sobol2d(n: int, scramble: int = 0):
    """(n, 2) Sobol points: dim0 = van der Corput base 2, dim1 = the
    classic direction numbers (sobol.cpp's first two dimensions)."""
    idx = np.arange(n, dtype=np.uint32)
    # dim 0: bit-reversed index
    v = idx.copy()
    v = ((v >> 16) | (v << 16)) & 0xFFFFFFFF
    v = ((v & 0x00FF00FF) << 8) | ((v & 0xFF00FF00) >> 8)
    v = ((v & 0x0F0F0F0F) << 4) | ((v & 0xF0F0F0F0) >> 4)
    v = ((v & 0x33333333) << 2) | ((v & 0xCCCCCCCC) >> 2)
    v = ((v & 0x55555555) << 1) | ((v & 0xAAAAAAAA) >> 1)
    d0 = (v ^ scramble) * (1.0 / (1 << 32))
    # dim 1: Sobol direction numbers for the second dimension
    result = np.zeros(n, np.uint32)
    directions = np.zeros(32, np.uint32)
    directions[0] = 1 << 31
    for i in range(1, 32):
        directions[i] = directions[i - 1] ^ (directions[i - 1] >> 1)
    for bit in range(32):
        mask = ((idx >> bit) & 1).astype(bool)
        result[mask] ^= directions[bit]
    d1 = (result ^ scramble) * (1.0 / (1 << 32))
    return jnp.asarray(np.stack([d0, d1], axis=-1), jnp.float32)


def faure(n: int, dims: int = 2, offset: int = 0):
    """(n, dims) Faure (0, s)-sequence (faure.cpp): all dimensions share
    one prime base b >= dims; dimension j applies the j-th power of the
    upper-triangular Pascal matrix (mod b) to the base-b digits before
    the radical inverse. Host-side numpy (sample tables are built once)."""
    b = int(PRIMES[np.searchsorted(PRIMES, max(dims, 2))])
    n_digits = int(np.ceil(np.log(max(n + offset, 2)) / np.log(b))) + 1
    idx = np.arange(offset, offset + n, dtype=np.int64)
    digits = np.empty((n_digits, n), np.int64)  # least significant first
    rem = idx.copy()
    for k in range(n_digits):
        digits[k] = rem % b
        rem //= b
    # Pascal matrix P[r, c] = C(c, r) mod b (upper triangular)
    pascal = np.zeros((n_digits, n_digits), np.int64)
    pascal[0, :] = 1
    for r in range(1, n_digits):
        for c in range(r, n_digits):
            pascal[r, c] = (pascal[r - 1, c - 1] + pascal[r, c - 1]) % b
    weights = (1.0 / b) ** np.arange(1, n_digits + 1)
    cols = []
    d_j = digits
    for _ in range(dims):
        cols.append(weights @ (d_j % b))
        d_j = pascal @ d_j % b
    return jnp.asarray(np.stack(cols, axis=-1), jnp.float32)


def ld2d(n: int, scramble: int = 0):
    """(n, 2) low-discrepancy (0, 2)-sequence points — the ldsampler
    plugin (ldsampler.cpp) uses exactly this Sobol-(0,2) pair."""
    return sobol2d(n, scramble=scramble)


def stratified2d(key, nx: int, ny: int):
    """(nx*ny, 2) jittered-grid samples (stratified.cpp)."""
    xs, ys = jnp.meshgrid(jnp.arange(nx), jnp.arange(ny))
    cells = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    u = jax.random.uniform(key, (nx * ny, 2))
    return (cells + u) / jnp.array([nx, ny], jnp.float32)
