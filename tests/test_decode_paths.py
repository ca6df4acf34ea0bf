"""Decoder path equivalence: numpy blit vs JAX scatter renderer, and the
per-tile FS ditherer."""
import numpy as np

from tiler_tpu.bitstream.gtm import GTMWriter
from tiler_tpu.decode import decode_video, decode_video_jax
from tiler_tpu.ops.dither import dither_tile_floyd_steinberg


def _make_stream(rng):
    n_tiles, pal_size, pal_count, tw, th = 9, 8, 4, 5, 4
    tiles = rng.integers(0, pal_size, (n_tiles, 8, 8), dtype=np.uint8)
    pals = rng.integers(0, 256, (pal_count, pal_size, 3), dtype=np.uint8)
    w = GTMWriter(width=tw * 8, height=th * 8, fps=24.0, tiles_pal=tiles,
                  palette_size=pal_size, frame_count=3, kf_count=1)
    frames = []
    for f in range(3):
        frames.append(dict(
            tile_idx=rng.integers(0, n_tiles, tw * th),
            pal_idx=rng.integers(0, pal_count, tw * th),
            hmir=rng.random(tw * th) < 0.5,
            vmir=rng.random(tw * th) < 0.5,
            smoothed=(rng.random(tw * th) < 0.4) if f else
                np.zeros(tw * th, bool)))
    w.add_keyframe(0, 0, 2, pals, frames)
    return w.tobytes()


def test_jax_decoder_matches_numpy(rng):
    blob = _make_stream(rng)
    np_frames, _ = decode_video(blob)
    jx_frames = decode_video_jax(blob)
    np.testing.assert_array_equal(np_frames, jx_frames)


def test_tile_fs_identity_at_8bpc(rng):
    t = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(dither_tile_floyd_steinberg(t, 8), t)


def test_tile_fs_posterizes(rng):
    t = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    out = dither_tile_floyd_steinberg(t, 4)
    assert out.shape == t.shape
    assert not np.array_equal(out, t)
