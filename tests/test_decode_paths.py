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


def test_player_streams_golden_demo_lazily():
    """GTMPlayer decodes the published demo stream frame-by-frame: frames
    equal the batch decoder's, and only keyframe 0 has been decompressed
    after consuming keyframe 0's frames (constant-memory streaming)."""
    import os
    import pytest
    path = '/root/reference/docs/demo/city_cif.gtm'
    if not os.path.exists(path):
        pytest.skip('reference demo stream not available')
    from tiler_tpu.decode import decode_video
    from tiler_tpu.player import GTMPlayer

    data = open(path, 'rb').read()
    want, stream = decode_video(data)
    player = GTMPlayer(data)
    gen = player.frames()
    got = [next(gen) for _ in range(40)]
    np.testing.assert_array_equal(np.stack(got), want[:40])
    assert player.keyframes_decoded <= 2  # lazy: most KFs untouched
    assert player.width == stream.width
    assert abs(player.frame_interval_s * 1e9 - stream.frame_len_ns) < 1


def test_player_matches_batch_decode_and_loops(rng):
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.decode import decode_video
    from tiler_tpu.player import GTMPlayer

    frames = rng.integers(0, 256, (6, 48, 64, 3)).astype(np.uint8)
    blob = Encoder(EncoderConfig(palette_count=4, max_tiles=60)).run_all(
        frames, fps=24.0, fast_lzma=True)
    want, _ = decode_video(blob)
    player = GTMPlayer(blob)
    got = list(player.frames())
    np.testing.assert_array_equal(np.stack(got), want)
    # loop=True wraps to frame 0 with identical pixels
    gen = GTMPlayer(blob).frames(loop=True)
    run1 = [next(gen) for _ in range(6)]
    wrapped = next(gen)
    np.testing.assert_array_equal(wrapped, run1[0])


def test_scan_renderer_matches_reference_decoder():
    """Single-dispatch lax.scan renderer == per-frame numpy decode on the
    published demo stream (multi-palette, skip runs, mirrors)."""
    import os
    path = '/root/reference/docs/demo/city_cif.gtm'
    if not os.path.exists(path):
        import pytest
        pytest.skip('demo stream absent')
    from tiler_tpu.decode import decode_video, decode_video_jax_scan
    data = open(path, 'rb').read()
    want, _ = decode_video(data)
    got = decode_video_jax_scan(data)
    np.testing.assert_array_equal(got[:50], want[:50])
    np.testing.assert_array_equal(got, want)


def test_bundled_sample_stream_decodes():
    """The checked-in demo stream (decoders/web/sample.gtm) stays
    decodable: full decode, sane header fields, multi-keyframe."""
    from tiler_tpu.bitstream.gtm import parse_gtm
    from tiler_tpu.decode import decode_video
    data = open('/root/repo/decoders/web/sample.gtm', 'rb').read()
    frames, stream = decode_video(data)
    assert frames.shape == (48, 176, 320, 3)
    assert frames.max() > 0
    assert parse_gtm(data).header.kf_count >= 2
