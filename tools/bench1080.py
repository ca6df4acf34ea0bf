"""1080p encode benchmark — BASELINE.md's north-star resolution (the
reference caps its tilemap at 1920x1080, ReframeUI main.pas:1931-1964).

Synthetic 1920x1080 x 16 frames, reference default quality point
(128 palettes x 16 colors, Knoll dithering, FT Medium). Prints one JSON
line with wall time, fps, per-step and per-phase times. --warm runs an
untimed full encode first so the timed run measures steady-state
throughput (XLA executables cached).
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from bench import synthetic_clip  # noqa: E402

F, H, W = 16, 1080, 1920


def main():
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder

    frames = synthetic_clip(F, H, W)
    cfg = EncoderConfig(palette_count=128, tile_palette_size=16)
    warm = '--warm' in sys.argv
    if warm:
        Encoder(cfg).run_all(frames, fps=24.0, fast_lzma=True)
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    blob = enc.run_all(frames, fps=24.0, fast_lzma=True)
    dt = time.perf_counter() - t0

    dec, _stream = decode_video(blob)
    mse = np.mean((dec.astype(np.float64) - frames.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0
    print(json.dumps({
        'metric': 'encode_1080p16_wall_s' + ('_warm' if warm else ''),
        'value': round(dt, 1),
        'fps': round(F / dt, 4),
        'psnr': round(float(psnr), 3),
        'gtm_bytes': len(blob),
        'step_times': {k: round(v, 1)
                       for k, v in enc.state.step_times.items()},
        'dither_phases': enc.state.metrics.get('dither_phases'),
        'ft_phases': enc.state.metrics.get('ft_phases'),
        'gt_phases': enc.state.metrics.get('gt_phases'),
        'ft_knn_sizes': enc.state.metrics.get('ft_knn_sizes'),
    }))


if __name__ == '__main__':
    main()
