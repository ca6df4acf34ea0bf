"""MakeUnique step: merge exactly-identical dithered tiles.

Reference: MakeTilesUnique (/root/reference/main.pas:2555-2612) sorts tiles
by PalPixels bytes in 25-tilemap chunks and merges runs of equal tiles
(MergeTiles main.pas:3684-3712, tilemap forwarding main.pas:3722-3734).

Here the dedup is one global np.unique over the [N,64] byte matrix (a
superset of the reference's chunked dedup — the reference itself finishes
with a global MakeTilesUnique inside GlobalTiling, main.pas:4347). Winner =
lowest tile index of each group; use counts accumulate; tilemap references
forward to winners.

The tileset-level computation is a pure function (compute_unique_fwd) so
the multi-host encode can run it identically on every host over the
allgathered global tileset (parallel.gop_exact).
"""
from __future__ import annotations

import numpy as np

from .state import EncoderState


def compute_unique_fwd(tiles_pal: np.ndarray, tile_active: np.ndarray,
                       tile_use: np.ndarray):
    """Pure tileset-level dedup over the GLOBAL tile arrays.

    Returns (fwd [N] forwarding map, new_use [N], new_active [N],
    losers index array) without touching any tilemap."""
    n = len(tiles_pal)
    fwd = np.arange(n)
    act = np.flatnonzero(tile_active)
    if act.size == 0:
        return fwd, tile_use.copy(), tile_active.copy(), act
    keys = tiles_pal[act].reshape(len(act), -1)
    _, first_idx, inverse = np.unique(keys, axis=0, return_index=True,
                                      return_inverse=True)
    winners = act[first_idx][inverse]  # per active tile: its group winner

    fwd[act] = winners
    new_use = tile_use.copy()
    acc = np.bincount(winners, weights=tile_use[act],
                      minlength=n).astype(np.int64)
    losers = act[winners != act]
    new_use[act] = 0
    new_use += acc
    new_active = tile_active.copy()
    new_active[losers] = False
    return fwd, new_use, new_active, losers


def run_make_unique(state: EncoderState) -> EncoderState:
    fwd, new_use, new_active, losers = compute_unique_fwd(
        state.tiles_pal, state.tile_active, state.tile_use)
    state.tile_use = new_use
    state.tile_active = new_active
    state.tiles_pal[losers] = 0  # reference zeroes merged losers

    state.tm_tile = fwd[state.tm_tile].astype(np.int32)
    if state.stm_tile is not None:
        state.stm_tile = fwd[state.stm_tile].astype(np.int32)
    state.metrics['unique_tiles'] = int(state.tile_active.sum())
    return state
