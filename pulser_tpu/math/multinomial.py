"""Utility functions for bitstring sampling.

Matches the cumsum+searchsorted sampler of the reference
(``pulser-core/pulser/math/multinomial.py:18``), plus a vectorized JAX
variant used on-device by the emulator's sampling path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def multinomial(n_samples: int, probabilities: np.ndarray) -> np.ndarray:
    """Multinomial samples from the distribution given by `probabilities`.

    Unlike ``np.random.multinomial``, this doesn't assert that the
    probabilities sum to 1, and returns the indices of the samples instead
    of aggregated counts. Uses the global numpy RNG for drop-in seeded
    compatibility with the reference.

    Args:
        n_samples: Number of samples to return.
        probabilities: Probability distribution. Must sum to 1.

    Returns:
        Indices of samples with replacement.
    """
    rnd = np.random.rand(n_samples)
    cumsums = np.cumsum(probabilities)
    return np.searchsorted(cumsums, rnd)


def multinomial_jax(
    key: jax.Array, n_samples: int, probabilities: jax.Array
) -> jax.Array:
    """On-device multinomial sampling via cumsum + searchsorted.

    Args:
        key: A JAX PRNG key.
        n_samples: The (static) number of samples to draw.
        probabilities: 1D probability vector (need not be normalized
            exactly; cumulative sums are used as thresholds).

    Returns:
        ``(n_samples,)`` int32 array of sampled indices.
    """
    rnd = jax.random.uniform(key, (n_samples,), dtype=probabilities.dtype)
    cumsums = jnp.cumsum(probabilities)
    return jnp.searchsorted(cumsums, rnd)
