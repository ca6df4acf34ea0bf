"""Full 8-step pipeline tests (tiny shapes, CPU)."""
import numpy as np
import pytest

from tiler_tpu.config import EncoderConfig, FTQuality
from tiler_tpu.decode import decode_video
from tiler_tpu.ops.stats import psnr
from tiler_tpu.pipeline.encoder import Encoder


def clip(rng, f=6, h=48, w=64, cut=None):
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        base = ((xx * 3 + i * 2) % 256)[..., None] * np.array([1, .8, .5])
        if cut is not None and i >= cut:
            base = ((yy * 5 + 64) % 256)[..., None] * np.array([.3, .9, 1.])
        frames[i] = np.clip(base + rng.normal(0, 5, (h, w, 3)), 0, 255)
    return frames


@pytest.mark.parametrize('quality', [FTQuality.FAST, FTQuality.MEDIUM,
                                     FTQuality.SLOW])
def test_full_pipeline_roundtrip(rng, quality):
    frames = clip(rng, f=4)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16,
                        ft_quality=quality)
    enc = Encoder(cfg)
    blob = enc.run_all(frames, fps=24.0, fast_lzma=True)
    dec, stream = decode_video(blob)
    assert dec.shape == frames.shape
    # tileset was reduced below the raw count
    raw = frames.shape[0] * (frames.shape[1] // 8) * (frames.shape[2] // 8)
    assert stream.tiles.shape[0] < raw
    assert float(psnr(dec, frames)) > 18.0


def test_pipeline_with_hard_cut_multi_kf(rng):
    frames = clip(rng, f=8, cut=5)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16)
    enc = Encoder(cfg)
    blob = enc.run_all(frames, fps=24.0, fast_lzma=True)
    assert enc.state.metrics['n_keyframes'] == 2
    dec, stream = decode_video(blob)
    assert len(stream.frames) == 8
    assert stream.frames[4].kf_end and stream.frames[7].kf_end
    assert not stream.frames[2].kf_end
    assert float(psnr(dec, frames)) > 18.0


def test_smoothing_produces_skips(rng):
    # static clip: everything after frame 0 should smooth into skips
    frames = np.tile(clip(rng, f=1), (5, 1, 1, 1))
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16)
    enc = Encoder(cfg)
    blob = enc.run_all(frames, fps=24.0, fast_lzma=True)
    assert enc.state.metrics['smoothed_cells'] > 0
    dec, stream = decode_video(blob)
    # skipped cells decode identically to the previous frame
    np.testing.assert_array_equal(dec[1], dec[2])
    assert float(psnr(dec, frames)) > 18.0


def test_gts_export_reload(rng, tmp_path):
    frames = clip(rng, f=3)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16)
    enc = Encoder(cfg)
    enc.load(frames)
    enc.dither()
    enc.make_unique()
    from tiler_tpu.pipeline.global_tiling import run_global_tiling
    gts = str(tmp_path / 't.gts')
    run_global_tiling(enc.state, gts_out=gts)
    from tiler_tpu.bitstream.gtm import read_gts
    tiles, pal_size = read_gts(gts)
    assert pal_size == 16
    assert tiles.shape[0] == enc.state.metrics['reindexed_tiles']

    # re-encode a second clip against the saved tileset
    cfg2 = EncoderConfig(palette_count=4, tile_palette_size=16,
                         reload_tileset=gts)
    enc2 = Encoder(cfg2)
    enc2.load(clip(rng, f=2))
    enc2.dither()
    enc2.make_unique()
    enc2.global_tiling()
    # every reloaded tile's pixels come from the GTS tileset
    act = np.flatnonzero(enc2.state.tile_active)
    gts_set = {t.tobytes() for t in tiles}
    for t in enc2.state.tiles_pal[act][:20]:
        assert t.tobytes() in gts_set
