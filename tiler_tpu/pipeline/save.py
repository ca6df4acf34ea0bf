"""Save step: assemble the GTM bitstream from encoder state.

Reference: SaveStream (/root/reference/main.pas:4529-4763). Requires a
reindexed state (dense active tile indices). Uses the smoothed tilemap when
the Smooth step ran, otherwise the plain tilemap with no skips.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.gtm import GTMWriter
from .state import EncoderState


def run_save(state: EncoderState, fast_lzma: bool = False) -> bytes:
    cfg = state.config
    n_active = int(state.tile_active.sum())
    assert state.tile_active[:n_active].all(), 'save requires reindexed state'

    writer = GTMWriter(
        width=state.screen_w, height=state.screen_h, fps=state.fps,
        tiles_pal=state.tiles_pal[:n_active],
        palette_size=cfg.tile_palette_size,
        frame_count=state.n_frames, kf_count=len(state.keyframes),
        fast_lzma=fast_lzma, lzma_mode=cfg.lzma_mode)

    use_smoothed = state.stm_tile is not None
    for k, (s, e) in enumerate(state.keyframes):
        frames = []
        for fr in range(s, e + 1):
            if use_smoothed:
                frames.append(dict(
                    tile_idx=state.stm_tile[fr].ravel(),
                    pal_idx=state.stm_pal[fr].ravel(),
                    hmir=state.stm_h[fr].ravel(),
                    vmir=state.stm_v[fr].ravel(),
                    smoothed=state.stm_smooth[fr].ravel()))
            else:
                frames.append(dict(
                    tile_idx=state.tm_tile[fr].ravel(),
                    pal_idx=state.tm_pal[fr].ravel(),
                    hmir=state.tm_h[fr].ravel(),
                    vmir=state.tm_v[fr].ravel(),
                    smoothed=np.zeros(state.tilemap_size, bool)))
        writer.add_keyframe(k, int(s), int(e), state.palettes_rgb[k], frames)

    blob = writer.tobytes()
    state.metrics['gtm_bytes'] = len(blob)
    state.metrics['kbps'] = (len(blob) / 1024.0 * 8.0 / state.n_frames
                             * state.fps)
    return blob
