"""Microbenchmark the KModes per-iteration ops at the 720p bucket-1 shape
(86 lanes x 4096 points x 256 clusters, 80 attrs, 16 modalities): dissim
matmul, argmin+cost, update matmul, empty repair — each as a 20-step
fori_loop so dispatch overhead amortizes.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tiler_tpu.ops.kmodes import (_cost_triple, make_dissim_fn,  # noqa: E402
                                  DISSIM_SUB_MATCHING_BITS)

G, N, K, A, M = 86, 4096, 256, 80, 16
STEPS = 20


def timed(tag, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({'tag': tag, 'per_iter_ms':
                      round(min(ts) / STEPS * 1000, 2),
                      'total_s': round(min(ts), 3)}))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, M, (G, N, A), dtype=np.uint8))
    c0 = jnp.asarray(rng.integers(0, M, (G, K, A), dtype=np.uint8))
    valid_n = jnp.ones((G, N), bool)
    valid_k = jnp.ones((G, K), bool)

    def mk(xi, vk):
        return make_dissim_fn(xi, vk, M)

    @jax.jit
    def dissim_only(x, c0):
        def one(xi, vk, ci):
            dis, _ = mk(xi, vk)

            def body(i, c):
                d = dis(c)
                return jnp.clip(c + (d[:K, :A] % 2).astype(jnp.uint8), 0,
                                M - 1)
            return jax.lax.fori_loop(0, STEPS, body, ci)
        return jax.vmap(one)(x, valid_k, c0)

    @jax.jit
    def dissim_argmin_cost(x, c0):
        def one(xi, vn, vk, ci):
            dis, _ = mk(xi, vk)

            def body(i, carry):
                c, acc = carry
                d = dis(c)
                lab = jnp.argmin(d, axis=1).astype(jnp.int32)
                cost = _cost_triple(jnp.where(vn, jnp.min(d, axis=1), 0))
                c = jnp.clip(c + (lab[:K, None] % 2).astype(jnp.uint8),
                             0, M - 1)
                return c, acc + cost[0]
            return jax.lax.fori_loop(0, STEPS, body, (ci, jnp.int32(0)))
        return jax.vmap(one)(x, valid_n, valid_k, c0)

    @jax.jit
    def update_only(x, c0):
        def one(xi, vn, ci):
            _, ex = mk(xi, jnp.ones(K, bool))

            def body(i, carry):
                lab, acc = carry
                lab1h = ((lab[:, None] == jnp.arange(K)[None, :]) &
                         vn[:, None])
                counts = jnp.dot(lab1h.astype(jnp.bfloat16).T, ex,
                                 preferred_element_type=jnp.float32
                                 ).reshape(K, A, M)
                newc = jnp.argmax(counts, axis=-1).astype(jnp.uint8)
                lab = (lab + newc[0, 0].astype(jnp.int32)) % K
                return lab, acc + newc.astype(jnp.int32).sum()
            lab0 = jnp.zeros(N, jnp.int32)
            return jax.lax.fori_loop(0, STEPS, body, (lab0, jnp.int32(0)))
        return jax.vmap(one)(x, valid_n, c0)

    @jax.jit
    def empty_repair_only(x, c0):
        def one(xi, vn, ci):
            def body(i, carry):
                lab, acc = carry
                d_own = jnp.sum(
                    jnp.abs(xi.astype(jnp.int32) -
                            jnp.take(ci, lab, axis=0).astype(jnp.int32)),
                    axis=1)
                d_own = jnp.where(vn, d_own, -1)
                worst = jnp.argmax(d_own)
                lab = (lab + 1 + worst % 1) % K
                return lab, acc + d_own[0]
            lab0 = jnp.zeros(N, jnp.int32)
            return jax.lax.fori_loop(0, STEPS, body, (lab0, jnp.int32(0)))
        return jax.vmap(one)(x, valid_n, c0)

    timed('dissim_only', dissim_only, x, c0)
    timed('dissim_argmin_cost', dissim_argmin_cost, x, c0)
    timed('update_only', update_only, x, c0)
    timed('empty_repair_only', empty_repair_only, x, c0)


if __name__ == '__main__':
    main()
