"""Stage-3 1-NN matmul precision experiment on the real chip.

The fused Pallas kernel does an f32 [BQ,192]@[192,BC] dot per grid cell;
on the MXU an f32 dot is a multi-pass bf16 emulation, so casting the
OPERANDS to bf16 (accumulate still f32) may buy ~3x on the dominant term.
This tool measures wall time per variant and the winner-index agreement
between the f32 and bf16 paths on PsyV-feature-like data (wavelet coeffs
of YUV tiles — the actual stage-3 distribution), so the speed/exactness
tradeoff is decided from data, not guesswork.

Every rep forces a D2H sync (np.asarray) and varies the query batch —
jax.block_until_ready does not block on the tunneled backend and repeated
identical calls can be memoized (docs/NEXT.md).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np  # noqa: E402


def make_features(n, seed):
    """PsyV-like features: wavelet transform of YUV of random u8 tiles."""
    import jax.numpy as jnp

    from tiler_tpu.ops import features
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, (n, 8, 8, 3)).astype(np.uint8)
    out = np.empty((n, 192), np.float32)
    for lo in range(0, n, 65536):
        hi = min(n, lo + 65536)
        out[lo:hi] = np.asarray(features.psyv_features_rgb(
            jnp.asarray(tiles[lo:hi]), use_wavelets=True))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from tiler_tpu.ops.pallas_kernels import _nn_call, _nn_call_bf16
    print('backend:', jax.default_backend(), file=sys.stderr)

    n_c = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_q = 16384
    bq, bc = 2048, 4096
    # _nn_call builds its grid with nc // bc: a ragged n_c would silently
    # drop tail candidates and corrupt both agreement and TF/s figures
    n_c = -(-n_c // bc) * bc
    cands = make_features(n_c, 1)
    c_dev = jnp.asarray(cands)
    reps = 4
    qs = [jnp.asarray(make_features(n_q, 10 + r)) for r in range(reps)]

    results = {}
    for name, fn in [
        ('pallas_f32', lambda q: _nn_call(q, c_dev, bq, bc, False)),
        ('pallas_bf16', lambda q: _nn_call_bf16(q, c_dev, bq, bc, False)),
    ]:
        # warm compile
        np.asarray(fn(qs[0])[0])
        t0 = time.perf_counter()
        outs = []
        for r in range(reps):
            err, idx = fn(qs[r])
            outs.append((np.asarray(err), np.asarray(idx)))
        dt = (time.perf_counter() - t0) / reps
        flops = 2.0 * n_q * n_c * 192
        print(f'{name}: {dt*1e3:8.1f} ms  {flops/dt/1e12:6.1f} TF/s')
        results[name] = outs

    agree = np.mean([
        (results['pallas_f32'][r][1] == results['pallas_bf16'][r][1]).mean()
        for r in range(reps)])
    print(f'winner agreement f32 vs bf16: {agree*100:.4f}%')
    # and with bf16-ROUNDED features on both sides (the quality-neutral
    # variant: round once, search exactly in the rounded space)
    qs_r = [q.astype(jnp.bfloat16).astype(jnp.float32) for q in qs]
    c_r = c_dev.astype(jnp.bfloat16).astype(jnp.float32)
    # untimed warm-up: compiles the astype cast chains so the timed reps
    # measure steady state like the two variants above
    np.asarray(_nn_call_bf16(qs_r[0], c_r, bq, bc, False)[0])
    outs = []
    t0 = time.perf_counter()
    for r in range(reps):
        err, idx = _nn_call_bf16(qs_r[r], c_r, bq, bc, False)
        outs.append(np.asarray(idx))
    dt = (time.perf_counter() - t0) / reps
    print(f'pallas_bf16_rounded: {dt*1e3:8.1f} ms')
    agree = np.mean([(results['pallas_f32'][r][1] == outs[r]).mean()
                     for r in range(reps)])
    print(f'winner agreement f32 vs bf16-rounded: {agree*100:.4f}%')


if __name__ == '__main__':
    main()
