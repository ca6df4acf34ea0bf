"""Round-3 single-process TPU batch: full bench + FTQuality sweep.

One process = one first-op tunnel-stall lottery (docs/NEXT.md tunnel
discipline). Runs:
  1. bench.py main() — 1080p median-of-3 + real-content city 300f
  2. FTQuality sweep at a production operating point (720p, 128
     palettes): FAST / MEDIUM / SLOW cost + quality, chip-measured
     (round 2's sweep was CPU-backend; VERDICT r2 weak #6)

Prints the bench JSON line, then one `FTQ {...}` line per quality.
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def ftq_sweep():
    import numpy as np

    from bench import synthetic_clip
    from tiler_tpu.config import EncoderConfig, FTQuality
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder

    frames = synthetic_clip(6, 720, 1280, seed=3)
    for q in (FTQuality.FAST, FTQuality.MEDIUM, FTQuality.SLOW):
        cfg = EncoderConfig(palette_count=128, tile_palette_size=16,
                            ft_quality=q)
        Encoder(cfg).run_all(frames, fps=24.0, fast_lzma=True)  # warm
        enc = Encoder(cfg)
        t0 = time.perf_counter()
        blob = enc.run_all(frames, fps=24.0, fast_lzma=True)
        wall = time.perf_counter() - t0
        dec, _ = decode_video(blob)
        mse = np.mean((dec.astype(np.float64) -
                       frames.astype(np.float64)) ** 2)
        st = enc.state
        print('FTQ ' + json.dumps({
            'quality': q.name,
            'wall_s': round(wall, 2),
            'ft_step_s': round(st.step_times.get('frame_tiling', 0), 2),
            'ft_phases': st.metrics.get('ft_phases'),
            'knn_sizes': st.metrics.get('ft_knn_sizes'),
            'residual': round(st.metrics.get('ft_residual_err', 0), 1),
            'psnr': round(float(10 * np.log10(255.0 ** 2 / mse)), 3)
            if mse else 99.0,
            'gtm_bytes': len(blob),
        }), flush=True)


def main():
    os.environ.setdefault('TILER_BENCH_RUNS', '3')
    import bench
    bench.main()
    ftq_sweep()


if __name__ == '__main__':
    main()
