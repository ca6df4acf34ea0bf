"""Device-resident fast paths vs the pure host implementations.

The single-host encoder keeps tiles_pal on device between Dither and
Reindex (pipeline.state docstring); the multi-host path (parallel.
gop_exact) uses the host pure functions. These tests pin the two
implementations to identical results so the N-host == 1-host guarantee
can't silently drift.
"""
import jax.numpy as jnp
import numpy as np

from tiler_tpu.config import EncoderConfig
from tiler_tpu.pipeline.global_tiling import (
    compute_global_tiling_fwd, compute_global_tiling_fwd_device)
from tiler_tpu.pipeline.state import EncoderState
from tiler_tpu.pipeline.unique import (compute_unique_fwd,
                                       compute_unique_fwd_device)


def _mk_state(rng, n=600, palette_count=8, dup_every=3):
    cfg = EncoderConfig(palette_count=palette_count, tile_palette_size=16)
    st = EncoderState(config=cfg)
    tiles = rng.integers(0, 16, (n, 8, 8)).astype(np.uint8)
    # force duplicate groups and inactive rows
    tiles[::dup_every] = tiles[0]
    st.tiles_pal = tiles
    st.tile_active = rng.random(n) > 0.1
    st.tile_use = rng.integers(1, 5, n).astype(np.int64)
    st.tile_dpi = rng.integers(0, palette_count, n).astype(np.int32)
    return st


def test_unique_fwd_device_matches_host(rng):
    st = _mk_state(rng)
    f_h, u_h, a_h, l_h = compute_unique_fwd(
        st.tiles_pal, st.tile_active, st.tile_use)
    st.set_tiles_pal_device(jnp.asarray(np.array(st.tiles_pal)))
    f_d, u_d, a_d, l_d = compute_unique_fwd_device(st)
    np.testing.assert_array_equal(f_h, f_d)
    np.testing.assert_array_equal(u_h, u_d)
    np.testing.assert_array_equal(a_h, a_d)
    np.testing.assert_array_equal(np.sort(l_h), np.sort(l_d))


def test_global_tiling_fwd_device_matches_host(rng):
    st = _mk_state(rng, n=800, dup_every=1000)  # mostly distinct tiles
    desired = 60
    f_h, u_h, a_h, m_h = compute_global_tiling_fwd(
        st.tiles_pal, st.tile_active, st.tile_use, st.tile_dpi,
        st.config, desired)
    host_tiles = np.array(st.tiles_pal)
    st.set_tiles_pal_device(jnp.asarray(host_tiles))
    st._tiles_pal_host = None
    f_d, u_d, a_d, m_d = compute_global_tiling_fwd_device(
        st, st.config, desired)
    np.testing.assert_array_equal(f_h, f_d)
    np.testing.assert_array_equal(u_h, u_d)
    np.testing.assert_array_equal(a_h, a_d)
    assert m_h == m_d
