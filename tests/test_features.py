"""Core math kernels vs literal transliterations of the reference."""
import numpy as np
import pytest

import reference_impls as ref
from tiler_tpu.ops import color, features, stats


@pytest.fixture(scope='module')
def gamma_luts():
    return [(np.arange(256) / 255.0) ** 2.0,
            (np.arange(256) / 255.0) ** 0.6]


def test_yuv_matches_reference(rng, gamma_luts):
    cols = rng.integers(0, 256, (64, 3))
    got = np.asarray(color.rgb_to_yuv(color.srgb_unit(cols, None)))
    for i, (r, g, b) in enumerate(cols):
        want = ref.rgb_to_yuv(r, g, b, gamma_luts, -1)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_yuv_gamma_matches_reference(rng, gamma_luts):
    cols = rng.integers(0, 256, (32, 3))
    got = np.asarray(color.rgb_to_yuv(color.srgb_unit(cols, 2.0)))
    for i, (r, g, b) in enumerate(cols):
        want = ref.rgb_to_yuv(r, g, b, gamma_luts, 0)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_lab_matches_reference(rng, gamma_luts):
    cols = rng.integers(0, 256, (64, 3))
    got = np.asarray(color.rgb_to_lab(color.srgb_unit(cols, None)))
    for i, (r, g, b) in enumerate(cols):
        want = ref.rgb_to_lab(int(r), int(g), int(b), gamma_luts, -1)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-3)


def test_hsv_roundtrip_matches_reference(rng):
    cols = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    h, s, v = color.rgb_to_hsv_int_np(cols)
    for i, (r, g, b) in enumerate(cols):
        want = ref.rgb_to_hsv_int(int(r), int(g), int(b))
        assert (h[i], s[i], v[i]) == want, (i, cols[i])
    back = color.hsv_to_rgb_int_np(h, s, v)
    for i in range(20):
        want = ref.hsv_to_rgb_int(int(h[i]), int(s[i]), int(v[i]))
        np.testing.assert_array_equal(back[i], want)


def test_color_compare_matches_reference(rng):
    a = rng.integers(0, 300, (50, 3))
    b = rng.integers(0, 300, (50, 3))
    got = np.asarray(color.color_compare_i32(a, b))
    for i in range(50):
        want = ref.color_compare(*a[i], *b[i])
        assert got[i] == want


def test_dct_features_match_reference(rng, gamma_luts):
    tiles = rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(features.psyv_features_rgb(tiles))
    for i in range(len(tiles)):
        want = ref.compute_tile_psyvis_features(
            tile_rgb=tiles[i], gamma_luts=gamma_luts, gamma_cor=-1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_dct_qweighting_matches_reference(rng, gamma_luts):
    tiles = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(features.psyv_features_rgb(tiles, q_weighting=True))
    for i in range(len(tiles)):
        want = ref.compute_tile_psyvis_features(
            tile_rgb=tiles[i], q_weighting=True,
            gamma_luts=gamma_luts, gamma_cor=-1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_wavelet_features_match_reference(rng, gamma_luts):
    tiles = rng.integers(0, 256, (3, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(features.psyv_features_rgb(tiles, use_wavelets=True))
    for i in range(len(tiles)):
        want = ref.compute_tile_psyvis_features(
            tile_rgb=tiles[i], use_wavelets=True,
            gamma_luts=gamma_luts, gamma_cor=-1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_lab_wavelet_features(rng, gamma_luts):
    """The dither-clustering configuration: LAB + wavelets
    (PrepareDitherTiles, main.pas:2120)."""
    tiles = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    got = np.asarray(features.psyv_features_rgb(
        tiles, use_lab=True, use_wavelets=True))
    for i in range(len(tiles)):
        want = ref.compute_tile_psyvis_features(
            tile_rgb=tiles[i], use_lab=True, use_wavelets=True,
            gamma_luts=gamma_luts, gamma_cor=-1)
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=5e-2)


def test_pal_features_with_mirrors(rng, gamma_luts):
    """FromPal + mirror reads (main.pas:3036-3047)."""
    tiles_pal = rng.integers(0, 16, (4, 8, 8)).astype(np.uint8)
    pal = rng.integers(0, 256, (4, 16, 3)).astype(np.uint8)
    hm = np.array([False, True, False, True])
    vm = np.array([False, False, True, True])
    got = np.asarray(features.psyv_features_pal(
        tiles_pal, pal, hmir=hm, vmir=vm))
    for i in range(4):
        want = ref.compute_tile_psyvis_features(
            tile_pal=tiles_pal[i], pal=pal[i], from_pal=True,
            hmirror=bool(hm[i]), vmirror=bool(vm[i]),
            gamma_luts=gamma_luts, gamma_cor=-1)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-3)


def test_pearson_matches_reference(rng):
    x = rng.standard_normal(500)
    y = x * 0.5 + rng.standard_normal(500)
    got = float(stats.pearson(np.asarray(x, np.float32),
                              np.asarray(y, np.float32)))
    want = ref.pearson_correlation(x, y)
    assert abs(got - want) < 1e-5


def test_interframe_correlation_batched(rng):
    frames = rng.integers(0, 256, (5, 16, 16, 3)).astype(np.uint8)
    got = np.asarray(stats.interframe_correlations(frames))
    for i in range(4):
        want = ref.pearson_correlation(
            frames[i].astype(float).ravel(), frames[i + 1].astype(float).ravel())
        assert abs(got[i] - want) < 1e-4


def test_mirror_tiles():
    t = np.arange(64).reshape(1, 8, 8)
    h = features.mirror_tiles(np.asarray(t), np.array([True]),
                              np.array([False]))
    np.testing.assert_array_equal(np.asarray(h)[0], t[0][:, ::-1])
    v = features.mirror_tiles(np.asarray(t), np.array([False]),
                              np.array([True]))
    np.testing.assert_array_equal(np.asarray(v)[0], t[0][::-1, :])


def test_interframe_correlation_host_matches_device(rng):
    """The host (numpy f64) correlations that drive shot detection match
    the device kernel within f32 tolerance, and are chunk-invariant
    (each pair computed independently — the streaming detector relies
    on this)."""
    frames = rng.integers(0, 256, (7, 24, 32, 3)).astype(np.uint8)
    host = stats.interframe_correlations_host(frames)
    dev = np.asarray(stats.interframe_correlations(frames))
    np.testing.assert_allclose(host, dev, atol=1e-5)
    # chunk-invariance: feeding overlapping chunks reproduces the pairs
    a = stats.interframe_correlations_host(frames[:4])
    b = stats.interframe_correlations_host(frames[3:])
    np.testing.assert_array_equal(np.concatenate([a, b]), host)
