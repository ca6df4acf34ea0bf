"""Dithering planners vs reference transliterations."""
import numpy as np

import reference_impls as ref
from tiler_tpu.constants import DITHERING_MAP
from tiler_tpu.ops import dither
from tiler_tpu.ops.color import luma_raw


def test_knoll_matches_reference(rng):
    n, s = 3, 16
    tiles = rng.integers(0, 256, (n, 8, 8, 3)).astype(np.uint8)
    pals = rng.integers(0, 256, (n, s, 3)).astype(np.uint8)
    got = dither.knoll_dither_tiles(tiles, pals)
    for i in range(n):
        lp = luma_raw(pals[i])
        for y in range(8):
            for x in range(8):
                plan = ref.devise_best_mixing_plan_thomas_knoll(
                    pals[i].astype(np.int64), tiles[i, y, x].astype(np.int64),
                    lp)
                mv = DITHERING_MAP[y * 8 + x]
                assert got[i, y, x] == plan[mv], (i, y, x)


def test_yliluoma_matches_reference(rng):
    n, s, mix = 2, 8, 4
    tiles = rng.integers(0, 256, (n, 8, 8, 3)).astype(np.uint8)
    pals = rng.integers(0, 256, (n, s, 3)).astype(np.uint8)
    got = dither.yliluoma_dither_tiles(tiles, pals, mixed_colors=mix)
    for i in range(n):
        lp = luma_raw(pals[i])
        for y in range(8):
            for x in range(8):
                plan = ref.devise_best_mixing_plan_yliluoma(
                    pals[i].astype(np.int64), tiles[i, y, x].astype(np.int64),
                    lp, mix)
                mv = (DITHERING_MAP[y * 8 + x] * len(plan)) >> 6
                assert got[i, y, x] == plan[mv], (i, y, x)


def test_fs_posterize_8bpc_is_identity(rng):
    frame = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out = dither.floyd_steinberg_posterize(frame, 8)
    np.testing.assert_array_equal(out, frame)


def test_fs_posterize_low_bpc_changes(rng):
    frame = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out = dither.floyd_steinberg_posterize(frame, 4)
    assert out.shape == frame.shape
    assert not np.array_equal(out, frame)


def test_kmeans_clusters_separated_data(rng):
    from tiler_tpu.ops.kmeans import kmeans
    centers = rng.normal(0, 10, (4, 16))
    pts = np.concatenate([c + rng.normal(0, 0.1, (50, 16)) for c in centers])
    labels, cents, iters = kmeans(np.asarray(pts, np.float32), 4)
    labels = np.asarray(labels)
    # all points of one true cluster share a label
    for g in range(4):
        grp = labels[g * 50:(g + 1) * 50]
        assert len(np.unique(grp)) == 1
    # distinct clusters get distinct labels
    assert len(np.unique(labels)) == 4


def test_kmeans_deterministic(rng):
    from tiler_tpu.ops.kmeans import kmeans
    x = np.asarray(rng.normal(0, 1, (200, 8)), np.float32)
    l1, c1, _ = kmeans(x, 8)
    l2, c2, _ = kmeans(x, 8)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_knoll_cached_matches_direct(rng):
    n, s = 6, 8
    tiles = rng.integers(0, 4, (n, 8, 8, 3)).astype(np.uint8) * 60
    pals = rng.integers(0, 256, (2, s, 3)).astype(np.uint8)
    group = np.array([0, 0, 1, 1, 0, 1])
    per_tile_pals = pals[group]
    direct = dither.knoll_dither_tiles(tiles, per_tile_pals)
    cached = dither.knoll_dither_tiles_cached(tiles, pals, group)
    np.testing.assert_array_equal(direct, cached)


def test_yliluoma_cached_matches_uncached(rng):
    """Plan dedup per (palette, color) must not change any pixel."""
    from tiler_tpu.ops.dither import (yliluoma_dither_tiles,
                                      yliluoma_dither_tiles_cached)
    tiles = rng.integers(0, 256, (60, 8, 8, 3)).astype(np.uint8)
    # few distinct colors so the dedup actually collapses rows
    tiles = (tiles // 64) * 64
    group_pals = rng.integers(0, 256, (4, 16, 3)).astype(np.uint8)
    groups = rng.integers(0, 4, 60).astype(np.int32)
    want = yliluoma_dither_tiles(tiles, group_pals[groups], mixed_colors=4)
    got = yliluoma_dither_tiles_cached(tiles, group_pals, groups,
                                       mixed_colors=4)
    np.testing.assert_array_equal(got, want)
