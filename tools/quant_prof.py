"""Profile the Dither quantize phase at 720p: host gather vs native DL3,
bin counts per palette group. Creates/reuses a post-load+prepare checkpoint
in scratch/.
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from bench import synthetic_clip  # noqa: E402

F, H, W = 24, 720, 1280
CKPT = os.path.join(__file__.rsplit('/', 2)[0], 'scratch', '720p_prep.npz')


def main():
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.dither_step import prepare_dither_keyframe
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    if not os.path.exists(CKPT):
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        frames = synthetic_clip(F, H, W)
        enc = Encoder(EncoderConfig(palette_count=128, tile_palette_size=16))
        enc.load(frames, fps=24.0)
        for k in range(len(enc.state.keyframes)):
            prepare_dither_keyframe(enc.state, k)
        save_checkpoint(CKPT, enc.state)
        print('checkpoint saved', file=sys.stderr)

    state = load_checkpoint(CKPT)
    cfg = state.config
    from tiler_tpu.ops import palette
    from tiler_tpu.ops.palette import native

    for k in range(len(state.keyframes)):
        s, e = state.keyframes[k]
        cell_tiles = state.tm_tile[s:e + 1].ravel()
        active = state.tile_active[cell_tiles]
        dpi = state.tile_dpi[cell_tiles]

        t_gather = t_native = 0.0
        bins = []
        px_counts = []
        mbpc = (1 << cfg.dl3_bpc) - 1
        for p in range(cfg.palette_count):
            t0 = time.perf_counter()
            sel = cell_tiles[active & (dpi == p)]
            px = state.tiles_rgb[sel].reshape(-1, 3)
            t_gather += time.perf_counter() - t0
            px_counts.append(len(px))
            t0 = time.perf_counter()
            palette.dl3_palette(px, cfg.tile_palette_size,
                                cfg.dl3_bpc, cfg.dl3_bin_cap)
            t_native += time.perf_counter() - t0
            p64 = px.astype(np.int64)
            idx = ((p64[:, 2] * mbpc // 255)
                   | (p64[:, 1] * mbpc // 255) << cfg.dl3_bpc
                   | (p64[:, 0] * mbpc // 255) << (2 * cfg.dl3_bpc))
            bins.append(len(np.unique(idx)))
        print(json.dumps({
            'kf': k, 'gather_s': round(t_gather, 3),
            'native_s': round(t_native, 3),
            'px_total': int(np.sum(px_counts)),
            'bins_max': int(np.max(bins)), 'bins_mean': float(np.mean(bins)),
        }))


if __name__ == '__main__':
    main()
