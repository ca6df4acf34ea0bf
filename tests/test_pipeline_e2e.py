"""End-to-end pipeline tests on tiny synthetic clips (CPU)."""
import numpy as np
import pytest

from tiler_tpu.config import EncoderConfig
from tiler_tpu.decode import decode_video
from tiler_tpu.ops.stats import psnr
from tiler_tpu.pipeline.encoder import Encoder


def synthetic_clip(rng, f=6, h=48, w=64, cut=None):
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        base = ((xx * 3 + i * 4) % 256)[..., None] * np.array([1, .8, .5])
        if cut is not None and i >= cut:
            base = ((yy * 5 + 64) % 256)[..., None] * np.array([.3, .9, 1.])
        frames[i] = np.clip(base + rng.normal(0, 6, (h, w, 3)), 0, 255)
    return frames


@pytest.fixture(scope='module')
def small_cfg():
    return EncoderConfig(palette_count=4, tile_palette_size=16)


def test_keyframe_detection_hard_cut(rng, small_cfg):
    frames = synthetic_clip(rng, f=8, cut=5)
    enc = Encoder(small_cfg)
    enc.load(frames)
    assert enc.state.keyframes.tolist() == [[0, 4], [5, 7]]


def test_encode_decode_roundtrip_quality(rng, small_cfg):
    frames = synthetic_clip(rng, f=4)
    enc = Encoder(small_cfg)
    enc.load(frames)
    enc.dither()
    enc.make_unique()
    enc.reindex()
    blob = enc.save(fast_lzma=True)
    dec, stream = decode_video(blob)
    assert dec.shape == frames.shape
    assert len(stream.frames) == 4
    # 1:1 tiles with dithered palettes: decent reconstruction expected
    assert float(psnr(dec, frames)) > 25.0


def test_make_unique_merges_duplicates(rng, small_cfg):
    # constant-color clip: after dithering all tiles identical per keyframe
    frames = np.full((3, 32, 32, 3), 128, np.uint8)
    enc = Encoder(small_cfg)
    enc.load(frames)
    enc.dither()
    enc.make_unique()
    assert enc.state.metrics['unique_tiles'] == 1
    enc.reindex()
    blob = enc.save(fast_lzma=True)
    dec, stream = decode_video(blob)
    assert stream.tiles.shape[0] == 1
    assert float(psnr(dec, frames)) > 30.0


def test_var_quantizer_path(rng):
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16, use_dl3=False)
    frames = synthetic_clip(rng, f=3)
    enc = Encoder(cfg)
    enc.load(frames)
    enc.dither()
    enc.make_unique()
    enc.reindex()
    blob = enc.save(fast_lzma=True)
    dec, _ = decode_video(blob)
    assert float(psnr(dec, frames)) > 22.0


def test_yliluoma_path(rng):
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16,
                        use_thomas_knoll=False, yliluoma_mix=4)
    frames = synthetic_clip(rng, f=2)
    enc = Encoder(cfg)
    enc.load(frames)
    enc.dither()
    enc.make_unique()
    enc.reindex()
    blob = enc.save(fast_lzma=True)
    dec, _ = decode_video(blob)
    assert float(psnr(dec, frames)) > 22.0


def test_motion_aware_upload_reconstruction(rng):
    """The changed-tiles upload + device fill-gather must reproduce the
    source tile tensor EXACTLY (identity order), including across
    keyframe boundaries and for fully-static spans."""
    import jax.numpy as jnp

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline.load import split_into_tiles

    f, h, w = 7, 48, 64
    frames = rng.integers(0, 255, (f, h, w, 3)).astype(np.uint8)
    frames[2] = frames[1]                 # fully static frame
    frames[3, :, :32] = frames[2, :, :32]  # half static
    frames[5] = frames[4]
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.load(frames)
    st = enc.state
    assert st.metrics['upload_changed_frac'] < 1.0
    want = split_into_tiles(frames, st.tilemap_h, st.tilemap_w)
    got = np.asarray(st.device_source_tiles())
    np.testing.assert_array_equal(got, want)
    # per-keyframe slices too
    for s, e in st.keyframes:
        cells = st.tilemap_size
        got_r = np.asarray(st.device_source_tiles_range(int(s), int(e)))
        np.testing.assert_array_equal(
            got_r, want[s * cells:(e + 1) * cells])
