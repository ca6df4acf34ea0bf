"""Pallas kernels vs their jnp fallbacks (interpreter mode on CPU)."""
import numpy as np

from tiler_tpu.ops import knn, pallas_kernels as pk


def test_nearest1_pallas_matches_fallback(rng):
    q = rng.normal(0, 1, (300, 192)).astype(np.float32)
    c = rng.normal(0, 1, (700, 192)).astype(np.float32)
    idx_p, err_p = pk.nearest_1_pallas(q, c, bq=256, bc=256)
    idx_f, err_f = knn.nearest_1(q, c)
    # float assoc differences can flip exact argmin on near-ties; verify
    # by distance values instead of indices
    d_p = ((q - c[idx_p]) ** 2).sum(1)
    d_f = ((q - c[idx_f]) ** 2).sum(1)
    np.testing.assert_allclose(d_p, d_f, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(err_p, d_p, rtol=1e-2, atol=1e-1)


def test_nearest1_aug_matches_f32_kernel(rng):
    """The augmented-matmul kernel (norms folded into the dot; see
    _nn_kernel_aug) agrees with the broadcast-norm kernel away from
    float near-ties, including padded candidates."""
    import jax.numpy as jnp
    from tiler_tpu.ops.pallas_kernels import _nn_call, _nn_call_aug
    q = rng.normal(0, 5, (512, 192)).astype(np.float32)
    c = rng.normal(0, 5, (1024, 192)).astype(np.float32)
    e1, i1 = _nn_call(jnp.asarray(q), jnp.asarray(c), 256, 256, True)
    e2, i2 = _nn_call_aug(jnp.asarray(q), jnp.asarray(c), 256, 256, True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-4, atol=1e-2)
    # padding rows (1e9 fill, as nearest_1_pallas pads) never win
    cpad = np.concatenate([c, np.full((512, 192), 1e9, np.float32)])
    _, i3 = _nn_call_aug(jnp.asarray(q), jnp.asarray(cpad), 256, 256, True)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i2))


def test_nearest1_pallas_exact_small():
    q = np.eye(8, 192, dtype=np.float32) * 5
    c = np.eye(8, 192, dtype=np.float32) * 5.1
    idx, err = pk.nearest_1_pallas(q, c, bq=8, bc=8)
    np.testing.assert_array_equal(idx, np.arange(8))




def test_nearest1_bf16_variant_matches_on_bf16_exact_features(rng):
    """_nn_call_bf16 (bf16 operands, f32 accumulate) equals the f32 kernel
    when features are exactly representable in bfloat16 (small integers:
    8 mantissa bits cover ints up to 256)."""
    import jax.numpy as jnp
    q = rng.integers(-64, 64, (256, 192)).astype(np.float32)
    c = rng.integers(-64, 64, (512, 192)).astype(np.float32)
    err_b, idx_b = pk._nn_call_bf16(jnp.asarray(q), jnp.asarray(c),
                                    256, 256, True)
    err_f, idx_f = pk._nn_call(jnp.asarray(q), jnp.asarray(c),
                               256, 256, True)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_f))
    np.testing.assert_allclose(np.asarray(err_b), np.asarray(err_f),
                               rtol=1e-5, atol=1e-2)
