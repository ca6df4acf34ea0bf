"""Determinism: the encoder must be a pure function of (frames, config).

The reference relies on fixed seeds (kmodes.pas:930 uses $42381337) but has
thread-order-dependent behavior in places; this framework guarantees
bit-identical bitstreams run to run (SURVEY.md §6/§7 hard parts)."""
import numpy as np

from tiler_tpu.config import EncoderConfig
from tiler_tpu.pipeline.encoder import Encoder


def _clip(rng):
    f, h, w = 5, 40, 56
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        frames[i] = np.clip(
            ((xx * 4 + i * 3) % 256)[..., None] * np.array([1, .7, .4])
            + rng.normal(0, 5, (h, w, 3)), 0, 255)
    return frames


def test_encode_bit_identical(rng):
    frames = _clip(rng)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16)
    blob1 = Encoder(cfg).run_all(frames.copy(), fast_lzma=True)
    blob2 = Encoder(cfg).run_all(frames.copy(), fast_lzma=True)
    assert blob1 == blob2


def test_encode_var_path_bit_identical(rng):
    frames = _clip(rng)
    cfg = EncoderConfig(palette_count=4, tile_palette_size=16, use_dl3=False)
    blob1 = Encoder(cfg).run_all(frames.copy(), fast_lzma=True)
    blob2 = Encoder(cfg).run_all(frames.copy(), fast_lzma=True)
    assert blob1 == blob2
