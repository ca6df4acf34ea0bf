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


def test_candidate_features_mirror_dedup_matches_direct(rng):
    """The mirror-dedup fast path (signed-permutation expansion,
    features.mirror_coeff_perms) produces the same candidate set with
    features equal to the direct pixel path up to f32 accumulation
    order."""
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.ops import features as F
    from tiler_tpu.pipeline import frame_tiling as ft
    from tiler_tpu.pipeline.encoder import Encoder

    frames = np.zeros((4, 48, 64, 3), np.uint8)
    yy, xx = np.mgrid[0:48, 0:64]
    for i in range(4):
        frames[i] = np.clip(
            ((xx * 4 + i * 2) % 256)[..., None] * np.array([1, .7, .4])
            + rng.normal(0, 5, (48, 64, 3)), 0, 255)
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16,
                                end_step='global_tiling'))
    enc.run_all(frames)
    state = enc.state
    ds, tile_of, attrs_of = ft.build_global_dataset(state)
    pm = ft.palette_similarity_mask(state, 0)
    used = ft.mark_candidates(state, 0, ds, tile_of, attrs_of, pm)

    f_fast, p_f, t_f, a_f = ft.candidate_features(state, 0, used, tile_of,
                                                  attrs_of)
    orig = F.mirror_coeff_perms
    try:
        F.mirror_coeff_perms = lambda w: None  # force the direct path
        f_dir, p_d, t_d, a_d = ft.candidate_features(state, 0, used,
                                                     tile_of, attrs_of)
    finally:
        F.mirror_coeff_perms = orig

    kf = (p_f.astype(np.int64) << 32) | (t_f.astype(np.int64) << 4) | a_f
    kd = (p_d.astype(np.int64) << 32) | (t_d.astype(np.int64) << 4) | a_d
    of_, od = np.argsort(kf), np.argsort(kd)
    np.testing.assert_array_equal(kf[of_], kd[od])
    d = np.abs(np.asarray(f_fast)[of_] - np.asarray(f_dir)[od])
    assert d.max() < 1e-4
    assert state.metrics['ft_pair_dedup'][0] > 1.0


def test_mark_candidates_matches_loop_form(rng):
    """The vectorized candidate marking equals the per-palette loop form
    (pure set logic) for every FTQuality level."""
    import numpy as np

    from tiler_tpu.config import EncoderConfig, FTQuality
    from tiler_tpu.pipeline import frame_tiling as ft
    from tiler_tpu.pipeline.encoder import Encoder

    frames = np.zeros((3, 40, 56, 3), np.uint8)
    yy, xx = np.mgrid[0:40, 0:56]
    for i in range(3):
        frames[i] = np.clip(
            ((xx * 5 + i * 4) % 256)[..., None] * np.array([.9, .6, 1.])
            + rng.normal(0, 6, (40, 56, 3)), 0, 255)

    for q in (FTQuality.FAST, FTQuality.MEDIUM, FTQuality.SLOW):
        enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16,
                                    ft_quality=q,
                                    end_step='global_tiling'))
        enc.run_all(frames)
        state = enc.state
        ds, tile_of, attrs_of = ft.build_global_dataset(state)
        pm = ft.palette_similarity_mask(state, 0) \
            if q == FTQuality.MEDIUM else None
        used = ft.mark_candidates(state, 0, ds, tile_of, attrs_of, pm)

        # loop-form oracle (the pre-vectorization implementation)
        cfg = state.config
        s, e = state.keyframes[0]
        cell_tiles = state.tm_tile[s:e + 1].ravel()
        cell_pals = state.tm_pal[s:e + 1].ravel()
        from tiler_tpu.ops import knn
        uq_tiles, tile_inv = np.unique(cell_tiles, return_inverse=True)
        queries = state.tiles_pal[uq_tiles].reshape(len(uq_tiles), -1) \
            .astype(np.float32)
        idxs, errs = knn.nearest_k(queries, ds, k=8)
        keep = np.ones_like(errs, bool)
        keep[:, 1:] = errs[:, 1:] != errs[:, :-1]
        ref = np.zeros((cfg.palette_count, len(ds)), bool)
        pair_ids = cell_pals.astype(np.int64) * len(uq_tiles) + tile_inv
        uq_pairs = np.unique(pair_ids)
        pair_pal = (uq_pairs // len(uq_tiles)).astype(np.int64)
        pair_row = (uq_pairs % len(uq_tiles)).astype(np.int64)
        for p in range(cfg.palette_count):
            rows = pair_row[pair_pal == p]
            if rows.size == 0:
                continue
            marked = np.unique(idxs[rows][keep[rows]])
            if q == FTQuality.FAST:
                ref[p, marked] = True
            elif q == FTQuality.SLOW:
                ref[:, marked] = True
            else:
                ref[np.ix_(pm[:, p], marked)] = True
        np.testing.assert_array_equal(used, ref), q


def test_assign_temporal_dedup_matches_full(rng, monkeypatch):
    """Temporal query dedup (byte-static cells forward-fill their 1-NN
    result) produces the byte-identical stream of a full per-cell assign
    on content with an exactly-static background."""
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.encoder import Encoder

    # one shot: static background, one moving block (exact static bytes)
    bg = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    frames = np.stack([bg] * 6)
    for i in range(6):
        x = 8 + 10 * i
        frames[i, 24:40, x:x + 16] = [250, 40, 90]

    def encode():
        enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16,
                                    smoothing_strength=0.0))
        blob = enc.run_all(frames, fast_lzma=True)
        return blob, enc.state.metrics

    blob_dedup, metrics = encode()
    assert metrics['ft_q_changed_frac'] < 0.8  # dedup actually fired

    monkeypatch.setenv('TILER_NO_QDEDUP', '1')
    blob_full, metrics_full = encode()
    assert metrics_full['ft_q_changed_frac'] == 1.0
    assert blob_dedup == blob_full
