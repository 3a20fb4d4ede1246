"""Content-keyed device-constant cache for tiny arrays.

Each eager ``jnp.asarray`` of a host value is a separate upload through the
device tunnel (~1-3 ms of dispatch latency); the warm single-scene localize
path re-uploads the same microphone geometry, material tables, and scalar
constants on every call.  ``dev_const`` memoizes the resulting device array
by CONTENT (bytes + shape + dtypes + backend), so repeat calls reuse the
committed buffer — values are identical to the uncached build (jax arrays
are immutable), only the transfer is skipped.

Only use for small arrays (keys hold a copy of the bytes).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_CACHE: Dict[Any, Any] = {}
_CAP = 512


def dev_const(value, dtype=None) -> jnp.ndarray:
    """``jnp.asarray(value, dtype)`` memoized by content."""
    if isinstance(value, jax.Array):
        # Already on device: np.asarray would FETCH it through the tunnel
        # (~27 ms) — far worse than the upload this cache avoids.
        return jnp.asarray(value, dtype)
    a = np.asarray(value)
    if a.nbytes > 4096:  # not a "tiny constant" — don't copy bytes around
        return jnp.asarray(a, dtype)
    key = (a.tobytes(), a.shape, a.dtype.str,
           jnp.dtype(dtype).str if dtype is not None else None,
           jax.default_backend())
    out = _CACHE.get(key)
    if out is None:
        if len(_CACHE) >= _CAP:
            _CACHE.clear()
        out = _CACHE[key] = jnp.asarray(a, dtype)
    return out
