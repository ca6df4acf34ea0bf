"""FTQuality levels (main.pas:141, UseOne main.pas:3802-3853): candidate
sets must nest FAST <= MEDIUM <= SLOW, MEDIUM's palette expansion follows
the reference's centroid-distance threshold (cFTPaletteTol = 0.05,
main.pas:22/3846), and all three levels produce decodable streams with
non-increasing residual error."""
import dataclasses

import numpy as np
import pytest

from tiler_tpu.config import EncoderConfig, FTQuality
from tiler_tpu.pipeline import frame_tiling as ft
from tiler_tpu.pipeline.encoder import Encoder


def _encoder_until_smooth(frames, quality):
    cfg = EncoderConfig(palette_count=8, tile_palette_size=16,
                        max_tiles=80, ft_quality=quality)
    enc = Encoder(cfg)
    enc.load(frames, 24.0)
    enc.dither()
    enc.make_unique()
    enc.global_tiling()
    return enc


@pytest.fixture(scope='module')
def clip():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (1, 64, 96, 3))
    frames = np.repeat(base, 5, axis=0).astype(np.uint8)
    for i in range(5):
        frames[i, (i * 8) % 56:(i * 8) % 56 + 8, :16] = [250, 30, 40]
    return frames


def test_candidate_sets_nest(clip):
    used_by_q = {}
    for q in (FTQuality.FAST, FTQuality.MEDIUM, FTQuality.SLOW):
        enc = _encoder_until_smooth(clip, q)
        st = enc.state
        ds, tile_of, attrs_of = ft.build_global_dataset(st)
        pal_mask = ft.palette_similarity_mask(st, 0) \
            if q == FTQuality.MEDIUM else None
        used_by_q[q] = ft.mark_candidates(st, 0, ds, tile_of, attrs_of,
                                          pal_mask)
    fast, med, slow = (used_by_q[q] for q in
                       (FTQuality.FAST, FTQuality.MEDIUM, FTQuality.SLOW))
    assert fast.shape == med.shape == slow.shape
    assert not (fast & ~med).any(), 'FAST must be a subset of MEDIUM'
    assert not (med & ~slow).any(), 'MEDIUM must be a subset of SLOW'
    # and the levels are genuinely different on multi-palette content
    assert fast.sum() <= med.sum() <= slow.sum()
    assert fast.sum() < slow.sum()


def test_palette_mask_includes_self(clip):
    enc = _encoder_until_smooth(clip, FTQuality.MEDIUM)
    mask = ft.palette_similarity_mask(enc.state, 0)
    assert mask.diagonal().all(), 'd(q,q)=0 < tol*highest must hold'


def test_residual_error_non_increasing_with_quality(clip):
    residuals = {}
    for q in (FTQuality.FAST, FTQuality.MEDIUM, FTQuality.SLOW):
        enc = _encoder_until_smooth(clip, q)
        enc.frame_tiling()
        residuals[q] = enc.state.metrics['ft_residual_err']
        enc.reindex()
        enc.smooth()
        blob = enc.save()
        from tiler_tpu.decode import decode_video
        dec, _ = decode_video(blob)
        assert dec.shape == clip.shape
    assert residuals[FTQuality.SLOW] <= residuals[FTQuality.MEDIUM] + 1e-3
    assert residuals[FTQuality.MEDIUM] <= residuals[FTQuality.FAST] + 1e-3
