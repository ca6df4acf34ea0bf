"""Smooth step: temporal tile merge for skip-run encoding.

Reference: btnSmoothClick (/root/reference/main.pas:1338-1370) +
DoTemporalSmoothing (main.pas:4071-4119). Per cell, the PsyV DCT
(quantization-weighted, no wavelets, linear gamma) of the current
palette-rendered tile is compared with the same cell one frame earlier; if
the RMS over 192 dims is within the strength the lower-indexed tile wins
and is copied across (lower index = more used after Reindex), and the cell
is marked Smoothed for skip encoding. The reference's backward copy
(PrevTMI := TMI) overwrites the previous frame's cell INCLUDING its
Smoothed flag — that quirk is preserved.

TPU-first: the reference parallelizes over rows with a sequential frame
chain; here the whole frame's cells are compared at once, and the chain
over frames carries (fields, features) of the previous frame so each
frame's features are computed exactly once.
"""
from __future__ import annotations

import numpy as np

from ..constants import TILE_DCT_SIZE
from ..ops import features
from .state import EncoderState

_SQRT_FACTOR = 1.0 / TILE_DCT_SIZE


def _frame_features(state: EncoderState, k: int, tile, pal, hm, vm):
    tp = state.tiles_pal[tile.ravel()]
    pals = state.palettes_rgb[k, pal.ravel()]
    out = np.asarray(features.psyv_features_pal(
        tp, pals, gamma_value=None, use_wavelets=False, q_weighting=True,
        hmir=hm.ravel(), vmir=vm.ravel()))
    return out.copy()  # np.asarray of a jax array is read-only


def run_smooth(state: EncoderState) -> EncoderState:
    strength = state.config.smoothing_strength
    f = state.n_frames
    state.stm_tile = state.tm_tile.copy()
    state.stm_pal = state.tm_pal.copy()
    state.stm_h = state.tm_h.copy()
    state.stm_v = state.tm_v.copy()
    state.stm_smooth = np.zeros_like(state.tm_tile, bool)

    kf_of = state.kf_of_frame()
    cells = state.tilemap_size

    # features of every frame's (static) TileMap items, batched per
    # keyframe: one device call per KF instead of per frame (bounded
    # working set: a KF spans at most ~24 frames)
    kf_feats: dict[int, np.ndarray] = {}

    def base_feat(fr: int) -> np.ndarray:
        k = int(kf_of[fr])
        if k not in kf_feats:
            kf_feats.clear()  # keep only the active keyframe resident
            s, e = state.keyframes[k]
            feats = _frame_features(
                state, k,
                state.tm_tile[s:e + 1], state.tm_pal[s:e + 1],
                state.tm_h[s:e + 1], state.tm_v[s:e + 1])
            kf_feats[k] = feats.reshape(e - s + 1, cells, 192)
        s = int(state.keyframes[int(kf_of[fr])][0])
        return kf_feats[int(kf_of[fr])][fr - s]

    prev_feat = None
    smoothed_cells = 0
    for fr in range(f):
        k = int(kf_of[fr])
        cur_tile = state.tm_tile[fr].ravel().copy()
        cur_pal = state.tm_pal[fr].ravel().copy()
        cur_h = state.tm_h[fr].ravel().copy()
        cur_v = state.tm_v[fr].ravel().copy()
        cur_sm = np.zeros_like(cur_tile, bool)
        cur_feat = base_feat(fr).copy()

        if fr > 0 and kf_of[fr - 1] == k:
            pt = state.stm_tile[fr - 1].ravel()
            rms = np.sqrt(((cur_feat - prev_feat) ** 2).sum(1)
                          * _SQRT_FACTOR)
            near = np.abs(rms) <= strength
            fwd = near & (cur_tile >= pt)     # copy prev -> cur
            bwd = near & ~fwd                  # copy cur -> prev (backward)

            sh = state.tm_tile[fr].shape
            # forward: cur takes prev's fields and features
            for cur_a, prev_a in ((cur_tile, pt),
                                  (cur_pal, state.stm_pal[fr - 1].ravel()),
                                  (cur_h, state.stm_h[fr - 1].ravel()),
                                  (cur_v, state.stm_v[fr - 1].ravel())):
                cur_a[fwd] = prev_a[fwd]
            cur_feat[fwd] = prev_feat[fwd]
            # backward: prev takes cur's fields, clearing its Smoothed flag
            if bwd.any():
                for prev_name, cur_a in (('stm_tile', cur_tile),
                                         ('stm_pal', cur_pal),
                                         ('stm_h', cur_h),
                                         ('stm_v', cur_v)):
                    arr = getattr(state, prev_name)[fr - 1].ravel()
                    arr[bwd] = cur_a[bwd]
                    getattr(state, prev_name)[fr - 1] = arr.reshape(sh)
                psm = state.stm_smooth[fr - 1].ravel()
                psm[bwd] = False
                state.stm_smooth[fr - 1] = psm.reshape(sh)
            cur_sm = near
            smoothed_cells += int(near.sum())

        sh = state.tm_tile[fr].shape
        state.stm_tile[fr] = cur_tile.reshape(sh)
        state.stm_pal[fr] = cur_pal.reshape(sh)
        state.stm_h[fr] = cur_h.reshape(sh)
        state.stm_v[fr] = cur_v.reshape(sh)
        state.stm_smooth[fr] = cur_sm.reshape(sh)
        prev_feat = cur_feat

    state.metrics['smoothed_cells'] = smoothed_cells
    return state
