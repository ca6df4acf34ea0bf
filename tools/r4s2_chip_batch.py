"""Round-4 session-2 chip batch (ONE process — the tunnel's first-op
stall lottery is unbounded, so every experiment shares the warm process):

1. city full-warm encode (bench operating point, fast_lzma) — wall +
   mesh_sharded_wall metric.
2. city + football re-encode with lzma_mode='auto' (optimal-parse native
   lc8 vs liblzma lc3, per-keyframe min; fast_lzma=False) — the
   smallest-stream configuration's bytes for docs/RESULTS.md.

Appends JSONL to docs/r4_batch_run2.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'r4_batch_run2.jsonl')


def emit(rec):
    rec = dict(rec)
    with open(OUT, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec), flush=True)


def main():
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video

    for clip in ('city', 'football'):
        path = f'/root/reference/docs/demo/{clip}_cif.gtm'
        src = open(path, 'rb').read()
        frames, _ = decode_video(src)
        cfg = EncoderConfig(palette_count=64, tile_palette_size=16)

        # full-input warm (compiles all shape buckets), then one timed
        # fast-lzma run = the bench protocol
        t0 = time.perf_counter()
        from tiler_tpu.pipeline.encoder import Encoder
        Encoder(cfg).run_all(frames, fps=30.0, fast_lzma=True)
        emit({'phase': f'{clip}_warm', 'wall_s': round(
            time.perf_counter() - t0, 1)})
        enc = Encoder(cfg)
        t0 = time.perf_counter()
        blob = enc.run_all(frames, fps=30.0, fast_lzma=True)
        dt = time.perf_counter() - t0
        dec, _ = decode_video(blob)
        mse = np.mean((dec.astype(np.float64)
                       - frames.astype(np.float64)) ** 2)
        emit({'phase': f'{clip}_fast', 'wall_s': round(dt, 2),
              'fps': round(len(frames) / dt, 2), 'gtm_bytes': len(blob),
              'ref_gtm_bytes': len(src),
              'psnr': round(float(10 * np.log10(255.0 ** 2 / mse)), 3)
              if mse else 99.0,
              'step_times': {k: round(v, 2)
                             for k, v in enc.state.step_times.items()},
              'mesh_sharded_wall': enc.state.metrics.get(
                  'mesh_sharded_wall')})

        # smallest-stream configuration: lzma auto (optimal-parse lc8 vs
        # liblzma lc3 per keyframe), full effort
        cfg_auto = EncoderConfig(palette_count=64, tile_palette_size=16,
                                 lzma_mode='auto')
        enc = Encoder(cfg_auto)
        t0 = time.perf_counter()
        blob_auto = enc.run_all(frames, fps=30.0, fast_lzma=False)
        dt = time.perf_counter() - t0
        dec, _ = decode_video(blob_auto)
        np.testing.assert_array_equal(dec.shape, frames.shape)
        emit({'phase': f'{clip}_auto', 'wall_s': round(dt, 2),
              'gtm_bytes': len(blob_auto), 'ref_gtm_bytes': len(src),
              'save_s': round(enc.state.step_times.get('save', 0.0), 2),
              'vs_ref_pct': round(
                  100.0 * (len(blob_auto) - len(src)) / len(src), 2)})


if __name__ == '__main__':
    main()
