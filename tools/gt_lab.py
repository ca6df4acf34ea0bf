"""GlobalTiling lab: iterate on the KModes solve without re-running the
whole 720p pipeline. First run creates a make_unique checkpoint in
scratch/; later runs start from it (delete the npz to refresh).

Usage: python tools/gt_lab.py [--host]
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from bench import synthetic_clip  # noqa: E402

F, H, W = 24, 720, 1280
CKPT = os.path.join(__file__.rsplit('/', 2)[0], 'scratch', '720p_mu.npz')


def main():
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline.global_tiling import run_global_tiling
    from tiler_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    if not os.path.exists(CKPT):
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        frames = synthetic_clip(F, H, W)
        enc = Encoder(EncoderConfig(palette_count=128, tile_palette_size=16))
        enc.load(frames, fps=24.0)
        enc.dither()
        enc.make_unique()
        save_checkpoint(CKPT, enc.state)
        print('checkpoint saved', file=sys.stderr)

    state = load_checkpoint(CKPT)
    if '--host' not in sys.argv:
        import jax.numpy as jnp
        state.set_tiles_pal_device(jnp.asarray(state.tiles_pal))
    for run in range(2):  # run 0 compiles; run 1 is warm
        s2 = load_checkpoint(CKPT)
        if '--host' not in sys.argv:
            import jax.numpy as jnp
            s2.set_tiles_pal_device(jnp.asarray(s2.tiles_pal))
        t0 = time.perf_counter()
        run_global_tiling(s2)
        dt = time.perf_counter() - t0
        print(json.dumps({
            'run': run, 'wall_s': round(dt, 2),
            'gt_phases': s2.metrics.get('gt_phases'),
            'active_after': int(s2.tile_active.sum()),
            'merged': s2.metrics.get('global_tiling_merged'),
            'gt_iters': s2.metrics.get('gt_iters'),
        }))


if __name__ == '__main__':
    main()
