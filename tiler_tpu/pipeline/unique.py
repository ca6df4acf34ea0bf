"""MakeUnique step: merge exactly-identical dithered tiles.

Reference: MakeTilesUnique (/root/reference/main.pas:2555-2612) sorts tiles
by PalPixels bytes in 25-tilemap chunks and merges runs of equal tiles
(MergeTiles main.pas:3684-3712, tilemap forwarding main.pas:3722-3734).

Here the dedup is one global np.unique over the [N,64] byte matrix (a
superset of the reference's chunked dedup — the reference itself finishes
with a global MakeTilesUnique inside GlobalTiling, main.pas:4347). Winner =
lowest tile index of each group; use counts accumulate; tilemap references
forward to winners.
"""
from __future__ import annotations

import numpy as np

from .state import EncoderState


def run_make_unique(state: EncoderState) -> EncoderState:
    act = np.flatnonzero(state.tile_active)
    if act.size == 0:
        return state
    keys = state.tiles_pal[act].reshape(len(act), -1)
    _, first_idx, inverse = np.unique(keys, axis=0, return_index=True,
                                      return_inverse=True)
    winners = act[first_idx][inverse]  # per active tile: its group winner

    fwd = np.arange(state.n_tiles)
    fwd[act] = winners
    # accumulate use counts onto winners, deactivate losers
    new_use = np.bincount(winners, weights=state.tile_use[act],
                          minlength=state.n_tiles).astype(np.int64)
    losers = act[winners != act]
    state.tile_use[act] = 0
    state.tile_use += new_use
    state.tile_active[losers] = False
    state.tiles_pal[losers] = 0  # reference zeroes merged losers

    state.tm_tile = fwd[state.tm_tile].astype(np.int32)
    if state.stm_tile is not None:
        state.stm_tile = fwd[state.stm_tile].astype(np.int32)
    state.metrics['unique_tiles'] = int(state.tile_active.sum())
    return state
