"""On-chip A/B for the stage-3 assign optimizations (run on the real TPU).

Experiments, all in ONE process (first-op tunnel stalls are per-process):
  1. `_nn_call` (current: norms broadcast on the VPU) vs `_nn_call_aug`
     (norms folded into an augmented MXU matmul) at production-like shapes,
     on realistic PsyV features. Reports ms/call, effective TF/s, winner
     agreement between the two, and each one's winner agreement vs a
     float64 host ground truth on a subsample.
  2. Candidate-feature chunk build: the production `take_along_axis`
     palette LUT vs a one-hot-matmul LUT at the 256k chunk shape.

Usage: python tools/assign_opt_bench.py [--quick]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv


def realistic_features(n, seed, kind='rgb'):
    """PsyV features of random tiles at the default-config scale
    (wavelets on, no gamma, YUV for FT queries)."""
    import jax.numpy as jnp
    from tiler_tpu.ops import features
    rng = np.random.default_rng(seed)
    out = []
    chunk = 1 << 17
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        tiles = rng.integers(0, 256, (m, 8, 8, 3), np.uint8)
        f = features.psyv_features_rgb(tiles, gamma_value=None,
                                       use_lab=False, use_wavelets=True)
        out.append(np.asarray(f))
    return np.concatenate(out) if len(out) > 1 else out[0]


def timeit(fn, reps=5):
    fn()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(r[0])  # force D2H sync (block_until_ready lies on axon)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    import jax
    import jax.numpy as jnp
    from tiler_tpu.ops import pallas_kernels as pk
    print('backend:', jax.default_backend(), flush=True)
    interp = jax.default_backend() != 'tpu'

    n_q = int(os.environ.get('AOB_Q', 4096 if QUICK else 16384))
    n_c = int(os.environ.get('AOB_C', (1 << 18) if QUICK else (1 << 20)))
    bq, bc = (2048, 4096)
    print(f'shapes: Q={n_q} C={n_c} D=192 bq={bq} bc={bc}', flush=True)

    flops = 2.0 * n_q * n_c * 192

    if os.environ.get('AOB_SKIP_NN') != '1':
        q = realistic_features(n_q, 1)
        c = realistic_features(n_c, 2)
        qd, cd = jnp.asarray(q), jnp.asarray(c)
        jax.block_until_ready((qd, cd))
        np.asarray(qd[0])

        t_f32, (e1, i1) = timeit(
            lambda: pk._nn_call(qd, cd, bq, bc, interp))
        print(f'f32 kernel:  {t_f32*1e3:8.1f} ms  '
              f'{flops/t_f32/1e12:6.1f} TF/s', flush=True)
        t_aug, (e2, i2) = timeit(
            lambda: pk._nn_call_aug(qd, cd, bq, bc, interp))
        print(f'aug kernel:  {t_aug*1e3:8.1f} ms  '
              f'{flops/t_aug/1e12:6.1f} TF/s', flush=True)
        for bc2 in (2048, 8192):
            try:
                t_a2, _ = timeit(
                    lambda: pk._nn_call_aug(qd, cd, bq, bc2, interp))
                print(f'aug bc={bc2}: {t_a2*1e3:8.1f} ms  '
                      f'{flops/t_a2/1e12:6.1f} TF/s', flush=True)
            except Exception as e:  # noqa: BLE001 (VMEM OOM at big blocks)
                print(f'aug bc={bc2}: failed ({type(e).__name__})',
                      flush=True)

        i1h, i2h = np.asarray(i1), np.asarray(i2)
        agree = (i1h == i2h).mean()
        print(f'winner agreement f32 vs aug: {agree:.6f} '
              f'({int((i1h != i2h).sum())} differ)', flush=True)

        # f64 ground truth on a subsample
        m = 512
        qs = q[:m].astype(np.float64)
        best = np.full(m, np.inf)
        besti = np.zeros(m, np.int64)
        for lo in range(0, n_c, 1 << 16):
            hi = min(n_c, lo + (1 << 16))
            cc = c[lo:hi].astype(np.float64)
            d = ((qs ** 2).sum(1)[:, None] + (cc ** 2).sum(1)[None, :]
                 - 2.0 * qs @ cc.T)
            j = d.argmin(1)
            v = d[np.arange(m), j]
            take = v < best
            besti[take] = j[take] + lo
            best[take] = v[take]
        a1 = (i1h[:m] == besti).mean()
        a2 = (i2h[:m] == besti).mean()
        print(f'vs f64 truth: f32 {a1:.4f}  aug {a2:.4f} (n={m})',
              flush=True)
        print('err abs diff (aug vs f32): '
              f'{np.abs(np.asarray(e2)[:m] - np.asarray(e1)[:m]).max():.3f}',
              flush=True)

    # ---- experiment 2: candidate-feature palette LUT -----------------
    from tiler_tpu.ops import features as F
    n = int(os.environ.get('AOB_N', (1 << 16) if QUICK else (1 << 18)))
    rng = np.random.default_rng(3)
    tp = jnp.asarray(rng.integers(0, 16, (n, 8, 8), np.uint8))
    pals = jnp.asarray(rng.integers(0, 256, (n, 16, 3), np.uint8))

    @jax.jit
    def cur(tp, pals):
        cpn = F.pal_tiles_to_cpn(tp, pals, None, False)
        return F.psyv_from_cpn(cpn, use_wavelets=True)

    @jax.jit
    def onehot(tp, pals):
        idx = tp.astype(jnp.int32).reshape(n, 64)
        oh = jax.nn.one_hot(idx, 16, dtype=jnp.float32)      # [n,64,16]
        rgb = jnp.einsum('nps,nst->npt', oh,
                         pals.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        rgb = rgb.reshape(n, 8, 8, 3).astype(jnp.uint8)
        cpn = F.rgb_tiles_to_cpn(rgb, None, False)
        return F.psyv_from_cpn(cpn, use_wavelets=True)

    t_cur, r_cur = timeit(lambda: (cur(tp, pals),))
    t_oh, r_oh = timeit(lambda: (onehot(tp, pals),))
    same = np.allclose(np.asarray(r_cur[0]), np.asarray(r_oh[0]),
                       rtol=0, atol=0)
    print(f'cand_feats n={n}: take_along {t_cur*1e3:7.1f} ms | '
          f'one-hot {t_oh*1e3:7.1f} ms | bit-equal {same}', flush=True)


if __name__ == '__main__':
    main()
