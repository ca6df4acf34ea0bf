"""tiler_tpu: TPU-native rebuild of GliGli's TileMotion (GTM) video codec.

Encoder pipeline, bitstream, and decoder re-designed as batched JAX/XLA/Pallas
array programs over dense tile tensors; see SURVEY.md at the repo root for the
structural map of the reference this mirrors.
"""

__version__ = '0.1.0'

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache — OPT-IN via TILER_COMPILE_CACHE=1.

    Not enabled by default: on tunneled TPU backends each executable
    serialization stalls ~16s regardless of size (measured: a small
    encode's 22-entry population run took 437s vs 87.5s uncached), and
    XLA:CPU additionally persists machine-feature-specific AOT blobs that
    can SIGILL on other hosts. With a POPULATED cache the same cold
    encode drops to 25.6s (3.4x) — enable it when running many encodes
    on a stable shape set and eat the one-time population cost."""
    if _os.environ.get('TILER_COMPILE_CACHE') != '1':
        return
    try:
        import jax
        platforms = jax.config.jax_platforms or \
            _os.environ.get('JAX_PLATFORMS', '')
        if not any(p in str(platforms) for p in ('tpu', 'axon')):
            return
        path = _os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            _os.path.expanduser('~/.cache/tiler_tpu_xla'))
        _os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_compile_cache()

from .config import EncoderConfig, FTQuality  # noqa: F401
