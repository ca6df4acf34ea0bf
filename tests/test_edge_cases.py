"""Edge cases: tiny inputs, single frames, odd dimensions, corrupt data."""
import numpy as np
import pytest

from tiler_tpu.config import EncoderConfig
from tiler_tpu.decode import decode_video
from tiler_tpu.pipeline.encoder import Encoder


def test_single_frame_clip(rng):
    frames = rng.integers(0, 256, (1, 16, 16, 3)).astype(np.uint8)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    blob = enc.run_all(frames, fast_lzma=True)
    dec, stream = decode_video(blob)
    assert dec.shape == (1, 16, 16, 3)
    assert stream.frames[0].kf_end


def test_single_tile_frame(rng):
    frames = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    blob = enc.run_all(frames, fast_lzma=True)
    dec, _ = decode_video(blob)
    assert dec.shape == (2, 8, 8, 3)


def test_non_multiple_of_8_crops(rng):
    # 21x13 pixels -> 2x1 tiles; the remainder is cropped like the
    # reference's div-based tilemap (main.pas:1931-1964)
    frames = rng.integers(0, 256, (2, 13, 21, 3)).astype(np.uint8)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    blob = enc.run_all(frames, fast_lzma=True)
    dec, stream = decode_video(blob)
    assert (stream.width, stream.height) == (16, 8)


def test_too_small_input_raises():
    frames = np.zeros((1, 4, 4, 3), np.uint8)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    with pytest.raises(ValueError):
        enc.load(frames)


def test_corrupt_gtm_graceful():
    # zero-filled payload: either a clean error or an empty decode, never
    # a crash (the JS player silently stalls on garbage too)
    try:
        frames, stream = decode_video(b'GTMv' + b'\x00' * 100)
        assert len(stream.frames) == 0
    except ValueError:
        pass


def test_truncated_stream_partial_decode(rng):
    frames = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    blob = enc.run_all(frames, fast_lzma=True)
    # truncating inside the lzma payload yields fewer decodable frames but
    # no crash
    from tiler_tpu.bitstream.gtm import parse_gtm
    parsed = parse_gtm(blob[:len(blob) - 20])
    assert isinstance(parsed.commands, bytes)


def test_grayscale_like_clip(rng):
    # constant channels: palettes collapse; must still roundtrip
    g = rng.integers(0, 256, (2, 16, 16, 1)).astype(np.uint8)
    frames = np.repeat(g, 3, axis=3)
    enc = Encoder(EncoderConfig(palette_count=2, tile_palette_size=4))
    blob = enc.run_all(frames, fast_lzma=True)
    dec, _ = decode_video(blob)
    assert dec.shape == frames.shape


def test_max_palette_count_256(rng):
    """palette_count=256 exercises the full 8-bit palette attr field and
    the player's 256-palette store."""
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder
    frames = rng.integers(0, 255, (2, 32, 48, 3)).astype(np.uint8)
    cfg = EncoderConfig(palette_count=256, tile_palette_size=4,
                        max_tiles=20)
    blob = Encoder(cfg).run_all(frames, fps=24.0, fast_lzma=True)
    dec, _ = decode_video(blob)
    assert dec.shape == frames.shape


def test_palette_size_64(rng):
    """tile_palette_size=64: the GTS legacy headerless size boundary and
    a 64-entry LoadPalette payload."""
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder
    frames = rng.integers(0, 255, (2, 32, 48, 3)).astype(np.uint8)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=64,
                        max_tiles=20)
    blob = Encoder(cfg).run_all(frames, fps=24.0, fast_lzma=True)
    dec, _ = decode_video(blob)
    assert dec.shape == frames.shape
