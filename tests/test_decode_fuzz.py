"""Malformed-stream robustness: the decoders must reject corrupt input
with clean Python exceptions — never crash the process.

The native command parser (native/gtm_pack.cc) is the interesting
surface: crafted SetDimensions/TileSet words could previously drive a
multi-GB allocation (uncaught bad_alloc) or wrap a size computation
into an out-of-bounds memcpy.
"""
import numpy as np
import pytest

from tiler_tpu.bitstream.gtm import GTMWriter, parse_gtm
from tiler_tpu.native import gtm_parse_commands


def _valid_stream(rng):
    tiles = rng.integers(0, 16, (40, 8, 8), np.uint8)
    pals = rng.integers(0, 256, (4, 16, 3), np.uint8)
    cells = 4 * 3

    def frame(seed):
        r = np.random.default_rng(seed)
        return {
            'tile_idx': r.integers(0, 40, cells, np.int64),
            'pal_idx': r.integers(0, 4, cells, np.int64),
            'hmir': r.integers(0, 2, cells).astype(bool),
            'vmir': r.integers(0, 2, cells).astype(bool),
            'smoothed': np.zeros(cells, bool),
        }

    wr = GTMWriter(width=32, height=24, fps=24.0, tiles_pal=tiles,
                   palette_size=16, frame_count=2, kf_count=1)
    wr.add_keyframe(0, 0, 1, np.repeat(pals[None], 64, 0).reshape(-1, 16, 3)
                    [:256], [frame(1), frame(2)])
    blob = wr.tobytes()
    return bytes(parse_gtm(blob).commands)


def _parse(cmds: bytes):
    try:
        return gtm_parse_commands(cmds)
    except ValueError:
        return None  # clean rejection is fine


def test_parser_rejects_crafted_giant_tilecount(rng):
    """SetDimensions with a 2^32-ish tile count must error, not allocate
    256 GB (bad_alloc would abort the interpreter)."""
    evil = bytes([
        30, 0,           # gtSetDimensions
        4, 0, 3, 0,      # tilemap 4x3
        0, 0, 0, 0,      # frame_ns
        0xff, 0xff, 0xff, 0xff,  # tile count = 2^32-1
    ])
    with pytest.raises(ValueError):
        gtm_parse_commands(evil)


def test_parser_rejects_inverted_tileset_range(rng):
    """TileSet with tend < tstart previously wrapped size_t(cnt)*64 past
    the bounds check into an out-of-bounds memcpy."""
    evil = bytes([
        29, 0x40,        # gtTileSet, attrs=pal_size 1
        5, 0, 0, 0,      # tstart = 5
        1, 0, 0, 0,      # tend = 1  (< tstart)
    ]) + b'\x00' * 640
    with pytest.raises(ValueError):
        gtm_parse_commands(evil)


def test_parser_survives_truncations_and_flips(rng):
    cmds = _valid_stream(rng)
    ok = gtm_parse_commands(cmds)
    assert ok[4].shape[0] >= 40  # tiles parsed

    # every truncation point: clean result or clean ValueError
    for cut in range(0, len(cmds), 7):
        _parse(cmds[:cut])

    # random byte flips (seeded): no crash, no runaway allocation
    for trial in range(200):
        buf = bytearray(cmds)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        _parse(bytes(buf))


def test_lzma_fuzz_and_bomb_guard(rng):
    """The native LZMA1 decoder rejects corrupt streams cleanly and caps
    decompression-bomb expansion (a crafted 2^63 declared size must not
    allocate unbounded memory)."""
    import lzma as pylzma

    from tiler_tpu.native import lzma_decode_alone

    payload = bytes(rng.integers(0, 4, 1 << 16).astype(np.uint8))
    comp = pylzma.compress(payload, format=pylzma.FORMAT_ALONE)
    out, _ = lzma_decode_alone(comp)
    assert out == payload

    # declared-size tampering: a huge declared size must terminate
    # promptly — at the EOS marker (python writes unknown-size + EOS,
    # so the payload round-trips) or with a clean error; the 1 GiB
    # in-decoder output cap (lzma1.cc kMaxOutput) guards streams whose
    # content actually expands that far
    bomb = bytearray(comp)
    bomb[5:13] = (2 ** 63 - 1).to_bytes(8, 'little')
    try:
        out2, _ = lzma_decode_alone(bytes(bomb))
        assert out2 == payload
    except ValueError:
        pass

    # random corruption of the compressed body: clean result or error
    for _ in range(100):
        buf = bytearray(comp)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(13, len(buf))] = rng.integers(0, 256)
        try:
            lzma_decode_alone(bytes(buf))
        except ValueError:
            pass


def test_decode_video_rejects_garbage(rng):
    from tiler_tpu.decode import decode_video
    cases = (b'GTMv',                                 # truncated header
             bytes(rng.integers(0, 256, 512).astype(np.uint8)),  # garbage
             b'GTMv' + bytes(rng.integers(0, 256, 256).astype(np.uint8)))
    for blob in cases:
        with pytest.raises(ValueError):
            decode_video(blob)
