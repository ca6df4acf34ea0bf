"""Keyframe detection vs the transliterated oracle (main.pas:1099-1155) —
the last un-oracled control block from round 1. Synthetic correlation
traces cross every branch: hard cut, soft cut after grace, tile-budget
overflow, EWMA reset, and the degenerate flat trace."""
import numpy as np
import pytest

from reference_impls import keyframe_ranges_oracle
from tiler_tpu.pipeline.load import (detect_keyframes,
                                     keyframes_from_correlations)


def check(corr, tms, n):
    got = keyframes_from_correlations(np.asarray(corr, np.float64), tms, n)
    want = keyframe_ranges_oracle(np.asarray(corr, np.float64), tms, n)
    np.testing.assert_array_equal(got, want)
    return got


def test_flat_trace_single_keyframe():
    n = 30
    got = check(np.full(n - 1, 0.98), 300, n)
    assert got.shape == (1, 2) and got[0, 1] == n - 1


def test_hard_cut():
    corr = np.full(29, 0.97)
    corr[9] = 0.1   # ratio << 0.5 at frame 10
    got = check(corr, 300, 30)
    assert [10] == [s for s, _ in got[1:]]


def test_soft_cut_after_grace():
    # mild dips every frame would never fire before the 24-frame grace;
    # a 0.75-ratio dip at frame 30 fires the soft threshold only
    corr = np.full(59, 0.96)
    corr[29] = 0.70  # ratio ~0.73: soft (<0.9) but not hard (<0.5)
    got = check(corr, 300, 60)
    assert 30 in got[:, 0]


def test_soft_cut_inside_grace_does_not_fire():
    corr = np.full(19, 0.96)
    corr[9] = 0.70
    got = check(corr, 300, 20)
    assert got.shape == (1, 2)


def test_tile_budget_overflow_forces_keyframe():
    # 1080p-sized tilemap: 32400 cells -> budget forces a cut every
    # 24 frames even with perfect correlation
    tms = (1920 // 8) * (1080 // 8)
    corr = np.full(99, 1.0)
    got = check(corr, tms, 100)
    assert len(got) > 1
    spans = got[:, 1] - got[:, 0] + 1
    assert spans.max() <= 24


def test_ewma_reset_after_cut():
    # after a hard cut the EWMA restarts: an equal dip right after the
    # cut must NOT fire (av == -1 -> av = v -> ratio 1)
    corr = np.full(39, 0.95)
    corr[9] = 0.2    # hard cut at 10
    corr[10] = 0.2   # first corr after cut re-seeds the average
    got = check(corr, 300, 40)
    assert 10 in got[:, 0] and 11 not in got[:, 0]


def test_random_traces_match_oracle(rng):
    for tms in (300, 8100, 32400):
        for _ in range(5):
            n = int(rng.integers(2, 120))
            corr = rng.uniform(-0.2, 1.0, n - 1)
            check(corr, tms, n)


def test_detect_keyframes_pixels_end_to_end(rng):
    frames = np.repeat(rng.integers(0, 255, (1, 48, 64, 3)), 30, axis=0)
    frames = frames.astype(np.uint8)
    frames[15:] = rng.integers(0, 255, (15, 48, 64, 3)).astype(np.uint8)
    got = detect_keyframes(frames, 48)
    assert got[0].tolist() == [0, 14]
    assert got[1, 0] == 15
