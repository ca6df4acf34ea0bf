"""Profile the GlobalTiling KModes solve from the 720p make_unique
checkpoint: full solve vs farthest-first-init-only vs fixed-iteration
solves, per size bucket. Requires scratch/720p_mu.npz (tools/gt_lab.py).
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np  # noqa: E402

CKPT = __file__.rsplit('/', 2)[0] + '/scratch/720p_mu.npz'


def main():
    import jax
    import jax.numpy as jnp

    from tiler_tpu.constants import equal_quality_tile_count
    from tiler_tpu.ops import kmodes as km
    from tiler_tpu.pipeline.global_tiling import _signatures_device_jit
    from tiler_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(CKPT)
    cfg = state.config
    state.set_tiles_pal_device(jnp.asarray(state.tiles_pal))
    raw = state.n_frames * state.tilemap_size
    desired = min(round(cfg.qb_tiles * equal_quality_tile_count(raw)), raw)

    n = state.n_tiles
    act = np.flatnonzero(state.tile_active)
    a_pad = 1 << max(8, (act.size - 1).bit_length())
    act_p = np.full(a_pad, n, np.int32)
    act_p[:act.size] = act
    sigs_dev, sums_dev = _signatures_device_jit()(
        state.device_tiles_pal(), jnp.asarray(act_p), cfg.tile_palette_size)
    sums = np.asarray(sums_dev)[:act.size].astype(np.int64)
    dpi = state.tile_dpi[act]

    bin_sizes = np.bincount(np.maximum(dpi, 0), minlength=cfg.palette_count)
    eqtc = np.array([equal_quality_tile_count(s) for s in bin_sizes])
    share = desired / max(eqtc.sum(), 1)
    ccounts = np.ceil(eqtc * share).astype(np.int64)
    jobs = []
    for p in range(cfg.palette_count):
        sel = np.flatnonzero(dpi == p)
        nb, k = len(sel), int(ccounts[p])
        if nb == 0 or nb <= k or k == 0:
            continue
        s = sums[sel]
        jobs.append(dict(sel=sel.astype(np.int32), k=k,
                         start=int(np.flatnonzero(s == s.min())[-1])))

    sels = [j['sel'] for j in jobs]
    ks = [j['k'] for j in jobs]
    starts = [j['start'] for j in jobs]

    def timed(tag, fn, reps=3):
        fn()  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({'tag': tag, 'best_s': round(min(ts), 3),
                          'all': [round(t, 3) for t in ts]}))

    timed('full_solve', lambda: km.kmodes_batch_gather(
        sigs_dev, sels, ks, starts, cfg.tile_palette_size))
    for mi in (0, 1, 5, 10, 20):
        timed(f'solve_maxiters_{mi}', lambda mi=mi: km.kmodes_batch_gather(
            sigs_dev, sels, ks, starts, cfg.tile_palette_size, max_iters=mi))


if __name__ == '__main__':
    main()
