"""Bitstream layer tests: LZMA framing, GTM writer/parser round-trip,
golden decode of the reference demo streams."""
import os

import numpy as np
import pytest

from tiler_tpu.bitstream.gtm import (GTMCommand, GTMHeader, GTMWriter,
                                     emit_frame, parse_gtm, read_gts,
                                     write_gts, CMD_BITS, MAX_BLK_SKIP)
from tiler_tpu.bitstream.lzma_codec import (lzma_compress_alone,
                                            lzma_decompress_concat)
from tiler_tpu import native

DEMO = '/root/reference/docs/demo/city_cif.gtm'


def test_lzma_roundtrip_liblzma():
    data = bytes(range(256)) * 1000
    assert lzma_decompress_concat(lzma_compress_alone(data)) == data


def test_lzma_concat_streams():
    a, b = b'first stream' * 50, b'second stream' * 70
    blob = lzma_compress_alone(a) + lzma_compress_alone(b)
    assert lzma_decompress_concat(blob) == a + b


@pytest.mark.skipif(not native.available(), reason='no native lib')
def test_native_lzma_matches_liblzma():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 40, 5000, dtype=np.uint8).tobytes() * 3
    blob = lzma_compress_alone(data)
    out, consumed = native.lzma_decode_alone(blob)
    assert out == data
    assert consumed == len(blob)


def _ref_emit_frame(tile_idx, pal_idx, hmir, vmir, smoothed, kf_end):
    """Transliteration of the per-cell emission loop (main.pas:4675-4726)."""
    import struct
    out = bytearray()
    s = len(tile_idx)
    blk = 0
    for yx in range(s):
        if blk > 0:
            blk -= 1
            continue
        run = 0
        for yxs in range(yx, s):
            if not smoothed[yxs]:
                break
            run += 1
        run = min(MAX_BLK_SKIP, run)
        if run >= 1:
            out += struct.pack('<H', ((run - 1) << CMD_BITS)
                               | GTMCommand.SKIP_BLOCK)
            blk = run - 1
        else:
            attrs = (int(pal_idx[yx]) << 2) | (int(vmir[yx]) << 1) \
                | int(hmir[yx])
            if tile_idx[yx] < (1 << 16):
                out += struct.pack('<HH', (attrs << CMD_BITS)
                                   | GTMCommand.SHORT_TILE_IDX,
                                   int(tile_idx[yx]))
            else:
                out += struct.pack('<HHH', (attrs << CMD_BITS)
                                   | GTMCommand.LONG_TILE_IDX,
                                   int(tile_idx[yx]) & 0xffff,
                                   int(tile_idx[yx]) >> 16)
    out += struct.pack('<H', (int(kf_end) << CMD_BITS) | GTMCommand.FRAME_END)
    return bytes(out)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_emit_frame_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    s = 1500
    tile_idx = rng.integers(0, 100000 if seed % 2 else 500, s)
    pal_idx = rng.integers(0, 128, s)
    hmir = rng.random(s) < 0.3
    vmir = rng.random(s) < 0.3
    smoothed = rng.random(s) < (0.6 if seed < 2 else 0.95)
    got = emit_frame(tile_idx, pal_idx, hmir, vmir, smoothed, kf_end=True)
    want = _ref_emit_frame(tile_idx, pal_idx, hmir, vmir, smoothed, True)
    assert got == want


def test_emit_frame_long_skip_chunks():
    s = 3000
    smoothed = np.ones(s, bool)
    got = emit_frame(np.zeros(s, int), np.zeros(s, int),
                     np.zeros(s, bool), np.zeros(s, bool), smoothed, False)
    want = _ref_emit_frame(np.zeros(s, int), np.zeros(s, int),
                           np.zeros(s, bool), np.zeros(s, bool),
                           smoothed, False)
    assert got == want


def test_gtm_writer_parser_roundtrip():
    rng = np.random.default_rng(7)
    n_tiles, pal_size, pal_count = 37, 16, 8
    tw, th = 10, 6
    tiles = rng.integers(0, pal_size, (n_tiles, 8, 8), dtype=np.uint8)
    pals = rng.integers(0, 256, (pal_count, pal_size, 3), dtype=np.uint8)
    w = GTMWriter(width=tw * 8, height=th * 8, fps=25.0, tiles_pal=tiles,
                  palette_size=pal_size, frame_count=3, kf_count=1)
    frames = []
    for f in range(3):
        frames.append(dict(
            tile_idx=rng.integers(0, n_tiles, tw * th),
            pal_idx=rng.integers(0, pal_count, tw * th),
            hmir=rng.random(tw * th) < 0.5,
            vmir=rng.random(tw * th) < 0.5,
            smoothed=(rng.random(tw * th) < 0.3) if f else
                np.zeros(tw * th, bool)))
    w.add_keyframe(0, 0, 2, pals, frames)
    blob = w.tobytes()

    parsed = parse_gtm(blob)
    assert parsed.header.width == tw * 8
    assert parsed.header.kf_count == 1
    assert parsed.kf_infos[0].raw_size > 0

    from tiler_tpu.decode import interpret_commands
    s = interpret_commands(parsed)
    assert s.tilemap_w == tw and s.tilemap_h == th
    assert len(s.frames) == 3
    np.testing.assert_array_equal(s.tiles, tiles)
    # frame 0 has no smoothing: every cell drawn, in order
    f0 = s.frames[0]
    np.testing.assert_array_equal(f0.positions, np.arange(tw * th))
    np.testing.assert_array_equal(f0.tile_idx, frames[0]['tile_idx'])
    attrs = (frames[0]['pal_idx'] << 2) | (frames[0]['vmir'] << 1) \
        | frames[0]['hmir']
    np.testing.assert_array_equal(f0.attrs, attrs)
    assert f0.kf_end is False and s.frames[2].kf_end is True
    # palettes snapshot round-trips
    np.testing.assert_array_equal(
        f0.palettes[:pal_count, :, :3], pals)


def test_decode_roundtrip_pixels():
    """Full write->decode: pixels must equal palette[tile] with mirrors."""
    rng = np.random.default_rng(3)
    n_tiles, pal_size, pal_count, tw, th = 5, 4, 3, 4, 3
    tiles = rng.integers(0, pal_size, (n_tiles, 8, 8), dtype=np.uint8)
    pals = rng.integers(0, 256, (pal_count, pal_size, 3), dtype=np.uint8)
    w = GTMWriter(width=tw * 8, height=th * 8, fps=24.0, tiles_pal=tiles,
                  palette_size=pal_size, frame_count=1, kf_count=1)
    tile_idx = rng.integers(0, n_tiles, tw * th)
    pal_idx = rng.integers(0, pal_count, tw * th)
    hmir = rng.random(tw * th) < 0.5
    vmir = rng.random(tw * th) < 0.5
    w.add_keyframe(0, 0, 0, pals, [dict(
        tile_idx=tile_idx, pal_idx=pal_idx, hmir=hmir, vmir=vmir,
        smoothed=np.zeros(tw * th, bool))])
    from tiler_tpu.decode import decode_video
    frames, _ = decode_video(w.tobytes())
    assert frames.shape == (1, th * 8, tw * 8, 3)
    for cell in range(tw * th)[:6]:
        y, x = divmod(cell, tw)
        block = frames[0, y * 8:(y + 1) * 8, x * 8:(x + 1) * 8]
        t = tiles[tile_idx[cell]]
        if hmir[cell]:
            t = t[:, ::-1]
        if vmir[cell]:
            t = t[::-1, :]
        want = pals[pal_idx[cell]][t]
        np.testing.assert_array_equal(block, want)


def test_gts_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 16, (13, 8, 8), dtype=np.uint8)
    p = str(tmp_path / 't.gts')
    write_gts(p, tiles, 16)
    got, pal_size = read_gts(p)
    assert pal_size == 16
    np.testing.assert_array_equal(got, tiles)


@pytest.mark.skipif(not (os.path.exists(DEMO) and native.available()),
                    reason='demo file or native lib missing')
def test_golden_demo_decode():
    """The published demo stream (legacy headerless, lc=8 LZMA) decodes with
    the dimensions and structure the JS player reports."""
    from tiler_tpu.decode import interpret_commands
    s = interpret_commands(parse_gtm(open(DEMO, 'rb').read()))
    assert (s.width, s.height) == (352, 288)
    assert len(s.frames) == 300
    assert s.tiles.shape[0] == 26063
    assert s.frame_len_ns == 33333333
    # every frame fully covers the tilemap (skip+draw), enforced by parser
    assert s.frames[0].positions.size == s.tilemap_w * s.tilemap_h


@pytest.mark.skipif(not (os.path.exists(
    '/root/reference/docs/demo/football_cif.gtm') and native.available()),
    reason='demo file or native lib missing')
def test_golden_demo_decode_football():
    from tiler_tpu.decode import decode_video
    raw = open('/root/reference/docs/demo/football_cif.gtm', 'rb').read()
    frames, stream = decode_video(raw)
    assert (stream.width, stream.height) == (352, 288)
    assert len(frames) > 100
    # frames carry real image content
    assert 20 < frames[0].mean() < 235
    assert frames[0].std() > 10
