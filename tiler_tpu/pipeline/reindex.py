"""Reindex step: recount usage, drop inactive tiles, sort by use count.

Reference: btnReindexClick (/root/reference/main.pas:1199-1230) +
ReindexTiles (main.pas:4483-4527). Sort is use-count descending with
original-index tie-break (CompareTileUseCountRev, main.pas:4472-4481) so
frequent tiles get small indices (better skip/short-idx compression).
"""
from __future__ import annotations

import numpy as np

from .state import EncoderState


def compute_reindex(use: np.ndarray):
    """Pure: use counts [N] -> (order, idx_map). Tiles with zero use drop;
    survivors sort by use desc, index asc. Identical on every host given
    the psum'd use counts (parallel.gop_exact)."""
    n = len(use)
    act = np.flatnonzero(use > 0)
    order = act[np.lexsort((act, -use[act]))]
    idx_map = np.full(n, -1, np.int64)
    idx_map[order] = np.arange(len(order))
    return order, idx_map


def run_reindex(state: EncoderState) -> EncoderState:
    n = state.n_tiles
    use = np.bincount(state.tm_tile.ravel(), minlength=n).astype(np.int64)
    order, idx_map = compute_reindex(use)

    state.tiles_rgb = state.tiles_rgb[order]
    if state._tiles_pal_dev is not None and state._tiles_pal_host is None:
        # permute on device; the survivor set is small, so any later host
        # access (save/render) syncs cheaply
        import jax.numpy as jnp

        from ..utils.dispatch import note
        note('h2d')
        note('eager')
        state.set_tiles_pal_device(
            state.device_tiles_pal()[jnp.asarray(order.astype(np.int32))])
    else:
        state.tiles_pal = state.tiles_pal[order]
    state.tile_use = use[order]
    state.tile_dpi = state.tile_dpi[order]
    state.tile_active = np.ones(len(order), bool)

    state.tm_tile = idx_map[state.tm_tile].astype(np.int32)
    if state.stm_tile is not None:
        state.stm_tile = idx_map[state.stm_tile].astype(np.int32)
    assert (state.tm_tile >= 0).all(), 'tilemap references dropped tile'
    state.metrics['reindexed_tiles'] = len(order)
    return state
