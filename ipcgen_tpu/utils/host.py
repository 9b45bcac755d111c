"""Device->host transfer helpers.

Boolean arrays transfer pathologically slowly over remote-attached device
links (measured: 196 s for a 1.8 M-element random bool vs 0.5 s for the same
data as uint8 on a v5e tunnel).  Every hot-path transfer routes through
``to_host``, which reinterprets bools as uint8 on device first.
"""

from __future__ import annotations

import numpy as np


def to_host(x) -> np.ndarray:
    """np.asarray with a device-side uint8 detour for boolean arrays."""
    import jax.numpy as jnp

    if hasattr(x, "dtype") and x.dtype == jnp.bool_ and not isinstance(x, np.ndarray):
        return np.asarray(jnp.asarray(x).astype(jnp.uint8)).astype(bool)
    return np.asarray(x)
