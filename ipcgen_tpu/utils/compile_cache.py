"""Persistent XLA compilation cache helper.

Every pipeline stage compiles a handful of large programs (the Pallas scan,
SDF fusion, k-NN sweeps).  Shape bucketing keeps the number of distinct
programs small; this cache keeps them across processes so only the first-ever
room pays compilation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

_DEFAULT_DIR = "~/.cache/ipcgen_tpu_xla"
_enabled = False


def enable_persistent_cache(cache_dir: Optional[str] = None) -> bool:
    """Idempotently point JAX's compilation cache at a persistent directory."""
    global _enabled
    if _enabled:
        return True
    import jax

    try:
        path = Path(cache_dir or _DEFAULT_DIR).expanduser()
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache EVERYTHING, including sub-second eager ops: on the remote
        # TPU link each tiny convert/slice/compare op costs ~0.5 s to
        # compile, and a pipeline stage dispatches dozens of them — the
        # uncached tail added ~60-100 s to every fresh process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return True
    except Exception:
        return False
