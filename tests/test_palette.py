"""Palette quantizers vs literal transliterations."""
import numpy as np
import pytest

import reference_impls as ref
from tiler_tpu import native
from tiler_tpu.constants import palette_pattern
from tiler_tpu.ops import palette


@pytest.mark.skipif(not native.available(), reason='no native lib')
@pytest.mark.parametrize('seed,m,bpc', [(0, 400, 5), (1, 1000, 7),
                                        (2, 64, 3)])
def test_dl3_matches_reference(seed, m, bpc):
    rng = np.random.default_rng(seed)
    # few distinct colors so bins merge meaningfully
    base = rng.integers(0, 256, (30, 3))
    px = base[rng.integers(0, 30, m)].astype(np.uint8)
    got = palette.dl3_palette(px, 16, bpc)
    want = ref.dl3_quant(px, 16, bpc)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason='no native lib')
def test_dl3_fewer_colors_than_palette():
    px = np.tile(np.array([[10, 20, 30], [200, 100, 50]], np.uint8), (5, 1))
    got = palette.dl3_palette(px, 16, 7)
    want = ref.dl3_quant(px, 16, 7)
    np.testing.assert_array_equal(got, want)
    assert (got[2:] == 0).all()


@pytest.mark.parametrize('seed,u', [(0, 50), (1, 200), (2, 120)])
def test_var_matches_reference(seed, u):
    rng = np.random.default_rng(seed)
    cols = np.unique(rng.integers(0, 1 << 24, u).astype(np.uint32))
    counts = rng.integers(1, 1000, len(cols)).astype(np.int64)
    pattern = palette_pattern(8, 16)[3]
    total = int(counts.sum() * 4)  # budget larger than bin usage, like real
    got = palette.var_palette(cols, counts, total, 0.95, 16, 8, pattern)
    want = ref.var_quantize(cols, counts, total, 0.95, 16, 8, pattern)
    np.testing.assert_array_equal(got, want)


def test_var_small_forced_merge(rng):
    """Force merging below 2048: palette_count*size smaller than colors."""
    cols = np.unique(rng.integers(0, 1 << 24, 300).astype(np.uint32))
    counts = rng.integers(1, 50, len(cols)).astype(np.int64)
    pattern = palette_pattern(2, 4)[1]
    got = palette.var_palette(cols, counts, int(counts.sum()), 0.5, 4, 2,
                              pattern)
    want = ref.var_quantize(cols, counts, int(counts.sum()), 0.5, 4, 2,
                            pattern)
    np.testing.assert_array_equal(got, want)


def test_sort_palette_lhs(rng):
    packed = rng.integers(0, 1 << 24, 16).astype(np.uint32)
    out = palette.sort_palette_lhs(packed)
    rgb = palette.packed_to_rgb(out).astype(np.int64)
    luma = (rgb[:, 0] * 2126 + rgb[:, 1] * 7152 + rgb[:, 2] * 722) // 10000
    assert (np.diff(luma) >= 0).all()
    assert sorted(out) == sorted(packed)


def test_dl3_tiles_gather_matches_pixel_form(rng):
    from tiler_tpu import native
    from tiler_tpu.ops import palette
    tiles = rng.integers(0, 255, (300, 8, 8, 3)).astype(np.uint8)
    sel = rng.choice(300, 120, replace=False).astype(np.int32)
    a = palette.dl3_palette_tiles(tiles, sel, 16, 7, 1024)
    b = palette.dl3_palette(tiles[sel].reshape(-1, 3), 16, 7, 1024)
    np.testing.assert_array_equal(a, b)
    # and the radix-sorted histogram still matches when uncapped (exact)
    a2, _ = native.dl3_quant_tiles_capped(tiles, sel, 16, 7, 1 << 21)
    b2, _ = native.dl3_quant(tiles[sel].reshape(-1, 3), 16, 7)
    np.testing.assert_array_equal(a2, b2)


def test_dl3_grid_premerge_matches_linear_sweep(rng):
    """The grid-bucketed nearest-kept search must pick the IDENTICAL merge
    target as the linear sweep (first min in scan order on ties)."""
    import os
    import subprocess
    import sys
    # run both paths in subprocesses (the env var is read inside the
    # native call, but isolate to be safe against lib caching)
    code = (
        "import sys, numpy as np\n"
        "sys.path.insert(0, %r)\n"
        "from tiler_tpu import native\n"
        "rng = np.random.default_rng(5)\n"
        "px = rng.integers(0, 255, (400000, 3)).astype(np.uint8)\n"
        "pal, n = native.dl3_quant_capped(px, 16, 7, 512)\n"
        "np.save(sys.argv[1], pal)\n" % os.path.join(
            os.path.dirname(__file__), '..'))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        a_path = os.path.join(d, 'a.npy')
        b_path = os.path.join(d, 'b.npy')
        subprocess.run([sys.executable, '-c', code, a_path], check=True)
        env = dict(os.environ, TILER_DL3_LINEAR_PREMERGE='1')
        subprocess.run([sys.executable, '-c', code, b_path], check=True,
                       env=env)
        np.testing.assert_array_equal(np.load(a_path), np.load(b_path))
