"""Dissim-kernel variants at the 720p bucket-1 shape: current two-matmul
bf16 form vs single fused matmul vs int8 MXU form.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tiler_tpu.ops.kmodes import make_dissim_fn  # noqa: E402

G, N, K, A, M = 86, 4096, 256, 80, 16
STEPS = 20
BITS = 11


def timed(tag, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({'tag': tag,
                      'per_iter_ms': round(min(ts) / STEPS * 1000, 2)}))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, M, (G, N, A), dtype=np.uint8))
    c0 = jnp.asarray(rng.integers(0, M, (G, K, A), dtype=np.uint8))

    @jax.jit
    def current(x, c0):
        def one(xi, ci):
            dis, _ = make_dissim_fn(xi, jnp.ones(K, bool), M)

            def body(i, c):
                d = dis(c)
                return jnp.clip(c + (d[:K, :A] % 2).astype(jnp.uint8),
                                0, M - 1)
            return jax.lax.fori_loop(0, STEPS, body, ci)
        return jax.vmap(one)(x, c0)

    @jax.jit
    def fused_bf16(x, c0):
        def one(xi, ci):
            xi32 = xi.astype(jnp.int32)
            ex = jax.nn.one_hot(xi32, M, dtype=jnp.bfloat16).reshape(
                N, A * M)
            thr = jnp.arange(M - 1)
            gx = (xi32[:, :, None] > thr).astype(jnp.bfloat16).reshape(
                N, A * (M - 1))
            X = jnp.concatenate([ex, gx], axis=1)  # [N, A*(2M-1)]
            gx_sum = jnp.sum(gx.astype(jnp.float32), axis=1)

            def body(i, c):
                ci32 = c.astype(jnp.int32)
                ec = jax.nn.one_hot(ci32, M, dtype=jnp.bfloat16).reshape(
                    K, A * M) * jnp.bfloat16(1 << BITS)
                gc = (ci32[:, :, None] > thr).astype(
                    jnp.bfloat16).reshape(K, A * (M - 1)) * jnp.bfloat16(2)
                C = jnp.concatenate([ec, gc], axis=1)
                dot = jnp.dot(X, C.T, preferred_element_type=jnp.float32)
                gc_sum = jnp.sum(gc.astype(jnp.float32), axis=1) * 0.5
                d = (jnp.float32(A << BITS) + gx_sum[:, None]
                     + gc_sum[None, :] - dot).astype(jnp.int32)
                return jnp.clip(c + (d[:K, :A] % 2).astype(jnp.uint8),
                                0, M - 1)
            return jax.lax.fori_loop(0, STEPS, body, ci)
        return jax.vmap(one)(x, c0)

    @jax.jit
    def fused_int8(x, c0):
        def one(xi, ci):
            xi32 = xi.astype(jnp.int32)
            ex = jax.nn.one_hot(xi32, M, dtype=jnp.int8).reshape(N, A * M)
            thr = jnp.arange(M - 1)
            gx = (xi32[:, :, None] > thr).astype(jnp.int8).reshape(
                N, A * (M - 1))
            X = jnp.concatenate([ex, gx], axis=1)
            gx_sum = jnp.sum(gx.astype(jnp.int32), axis=1)

            def body(i, c):
                ci32 = c.astype(jnp.int32)
                # int8 weights: ham col weighted 64, l1 col weighted 2;
                # later scale ham part by 32 to hit <<11 (64*32=2048)
                ec = jax.nn.one_hot(ci32, M, dtype=jnp.int8).reshape(
                    K, A * M)
                gc = (ci32[:, :, None] > thr).astype(jnp.int8).reshape(
                    K, A * (M - 1))
                m = jnp.dot(X[:, :A * M], ec.T,
                            preferred_element_type=jnp.int32)
                l = jnp.dot(X[:, A * M:], gc.T,
                            preferred_element_type=jnp.int32)
                gc_sum = jnp.sum(gc.astype(jnp.int32), axis=1)
                d = (((A - m) << BITS) + gx_sum[:, None] + gc_sum[None, :]
                     - 2 * l)
                return jnp.clip(c + (d[:K, :A] % 2).astype(jnp.uint8),
                                0, M - 1)
            return jax.lax.fori_loop(0, STEPS, body, ci)
        return jax.vmap(one)(x, c0)

    @jax.jit
    def fused_int8_one(x, c0):
        def one(xi, ci):
            xi32 = xi.astype(jnp.int32)
            ex = jax.nn.one_hot(xi32, M, dtype=jnp.int8).reshape(N, A * M)
            thr = jnp.arange(M - 1)
            gx = (xi32[:, :, None] > thr).astype(jnp.int8).reshape(
                N, A * (M - 1))
            X = jnp.concatenate([ex, gx], axis=1)
            gx_sum = jnp.sum(gx.astype(jnp.int32), axis=1)

            def body(i, c):
                ci32 = c.astype(jnp.int32)
                # single int8 matmul: ham one-hot weighted 64 (fits int8),
                # l1 thresholds weighted 2; then d = ((A<<11) - 32*hamdot)
                # ... requires splitting afterwards -> keep 2 outputs via
                # concat on K axis instead (same matmul, wider N)
                ec = jax.nn.one_hot(ci32, M, dtype=jnp.int8).reshape(
                    K, A * M)
                gc = (ci32[:, :, None] > thr).astype(jnp.int8).reshape(
                    K, A * (M - 1))
                z1 = jnp.zeros((K, A * (M - 1)), jnp.int8)
                z2 = jnp.zeros((K, A * M), jnp.int8)
                C = jnp.concatenate(
                    [jnp.concatenate([ec, z1], 1),
                     jnp.concatenate([z2, gc], 1)], 0)  # [2K, A*(2M-1)]
                dot = jnp.dot(X, C.T, preferred_element_type=jnp.int32)
                m, l = dot[:, :K], dot[:, K:]
                gc_sum = jnp.sum(gc.astype(jnp.int32), axis=1)
                d = (((A - m) << BITS) + gx_sum[:, None] + gc_sum[None, :]
                     - 2 * l)
                return jnp.clip(c + (d[:K, :A] % 2).astype(jnp.uint8),
                                0, M - 1)
            return jax.lax.fori_loop(0, STEPS, body, ci)
        return jax.vmap(one)(x, c0)

    timed('current_bf16_two', current, x, c0)
    timed('fused_bf16_one', fused_bf16, x, c0)
    timed('int8_two', fused_int8, x, c0)
    timed('int8_one_wide', fused_int8_one, x, c0)

    # numeric equivalence check of d across variants (single step, CPU-ish
    # shapes): compare against reference dissim
    from tiler_tpu.ops.kmodes import dissim_matrix
    xi = x[0]
    ci = c0[0]
    d_ref = np.asarray(dissim_matrix(xi, ci))
    for tag, fn in []:
        pass
    # int8 path check
    xi32 = xi.astype(jnp.int32)
    ex = jax.nn.one_hot(xi32, M, dtype=jnp.int8).reshape(N, A * M)
    thr = jnp.arange(M - 1)
    gx = (xi32[:, :, None] > thr).astype(jnp.int8).reshape(N, A * (M - 1))
    ci32 = ci.astype(jnp.int32)
    ec = jax.nn.one_hot(ci32, M, dtype=jnp.int8).reshape(K, A * M)
    gc = (ci32[:, :, None] > thr).astype(jnp.int8).reshape(K, A * (M - 1))
    m = jnp.dot(ex, ec.T, preferred_element_type=jnp.int32)
    l = jnp.dot(gx, gc.T, preferred_element_type=jnp.int32)
    gx_sum = jnp.sum(gx.astype(jnp.int32), axis=1)
    gc_sum = jnp.sum(gc.astype(jnp.int32), axis=1)
    d = np.asarray(((A - m) << BITS) + gx_sum[:, None] + gc_sum[None, :]
                   - 2 * l)
    print('int8 exact match:', bool((d == d_ref).all()))


if __name__ == '__main__':
    main()
