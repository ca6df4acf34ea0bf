"""Bounded-memory streaming encode (pipeline.stream)."""
import subprocess
import sys

import numpy as np

from tiler_tpu.config import EncoderConfig
from tiler_tpu.pipeline.stream import (OnlineKeyframeDetector,
                                       encode_streaming)


def _multishot(rng, f=14, h=48, w=64):
    """Three hard cuts -> 3-4 keyframes; enough frames that the online
    detector crosses chunk boundaries mid-GOP."""
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        shot = i // 5
        if shot == 0:
            pat = ((xx * 4 + i * 7) % 256)[..., None] * np.array([1, .7, .4])
        elif shot == 1:
            pat = ((yy * 5 + i * 9) % 256)[..., None] * np.array([.3, .5, 1])
        else:
            pat = (((xx + yy) * 3 + i * 5) % 256)[..., None] \
                * np.array([.8, 1, .3])
        frames[i] = np.clip(pat + rng.normal(0, 5, (h, w, 3)), 0, 255)
    return frames


def test_online_detector_matches_batch(rng):
    from tiler_tpu.pipeline.load import detect_keyframes
    frames = _multishot(rng, f=24)
    want = detect_keyframes(frames, (48 // 8) * (64 // 8))
    for chunk in (1, 3, 24):
        det = OnlineKeyframeDetector((48 // 8) * (64 // 8))
        starts = [0]
        for lo in range(0, len(frames), chunk):
            starts.extend(det.feed(frames[lo:lo + chunk]))
        got = np.array([[starts[k], (starts + [len(frames)])[k + 1] - 1]
                        for k in range(len(starts))], np.int32)
        np.testing.assert_array_equal(got, want), f'chunk={chunk}'


def test_streaming_matches_gop_sharded(rng, tmp_path):
    """THE streaming contract: byte-identical to the batch GOP-sharded
    encode (same boundaries, same per-GOP encodes, same container) while
    holding at most one GOP + one chunk of frames."""
    from tiler_tpu.parallel.distributed import encode_gop_sharded
    frames = _multishot(rng)
    cfg = EncoderConfig(palette_count=8, tile_palette_size=16,
                        max_tiles=120)
    want = encode_gop_sharded(frames, cfg, n_hosts=1, fps=24.0,
                              fast_lzma=True)
    out = str(tmp_path / 's.gtm')
    metrics = encode_streaming(iter(frames), cfg, out, fps=24.0,
                               fast_lzma=True, chunk=4)
    got = open(out, 'rb').read()
    assert got == want, 'streaming encode differs from batch GOP encode'
    # stream + mesh compose: still byte-identical
    import jax

    from tiler_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) >= 8:
        out8 = str(tmp_path / 's8.gtm')
        encode_streaming(iter(frames), cfg, out8, fps=24.0,
                         fast_lzma=True, chunk=4, mesh=make_mesh(8))
        assert open(out8, 'rb').read() == want
    assert metrics['n_keyframes'] >= 2
    assert metrics['max_buffered_frames'] < len(frames), \
        'memory bound: never held the whole clip'
    # decodes to the clip's shape with sane quality
    from tiler_tpu.decode import decode_video
    from tiler_tpu.ops.stats import psnr
    dec, _ = decode_video(got)
    assert dec.shape == frames.shape
    assert float(psnr(dec, frames)) > 16.0


def test_cli_stream_encode(rng, tmp_path):
    import os
    frames = _multishot(rng)
    src = str(tmp_path / 'clip.npy')
    np.save(src, frames)
    out = str(tmp_path / 'out.gtm')
    r = subprocess.run(
        [sys.executable, '-m', 'tiler_tpu', 'encode', src, out,
         '--stream', '--palette-count', '8', '--max-tiles', '120',
         '--fast-lzma'],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr
    from tiler_tpu.decode import decode_video
    dec, _ = decode_video(open(out, 'rb').read())
    assert dec.shape == frames.shape


def test_streaming_with_shared_gts_tileset(rng, tmp_path):
    """Two-pass global-tileset streaming: pass 1 produces a GTS (batch
    encode with gts_out), pass 2 streams against it — the tileset is
    emitted once, every GOP maps onto the shared indices, memory stays
    bounded (the reference's ReloadPreviousTiling workflow,
    main.pas:4372-4470, composed with streaming)."""
    import dataclasses

    from tiler_tpu.bitstream.gtm import parse_gtm, read_gts
    from tiler_tpu.decode import decode_video, interpret_commands
    from tiler_tpu.ops.stats import psnr
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline.global_tiling import run_global_tiling

    frames = _multishot(rng)
    cfg = EncoderConfig(palette_count=8, tile_palette_size=16,
                        max_tiles=120)

    # pass 1: tileset from a batch encode of sampled frames
    gts = str(tmp_path / 'pass1.gts')
    enc = Encoder(cfg)
    enc.load(frames[::2])
    enc.dither()
    enc.make_unique()
    run_global_tiling(enc.state, gts_out=gts)
    gts_tiles, _ = read_gts(gts)

    # pass 2: stream against the fixed tileset
    cfg2 = dataclasses.replace(cfg, reload_tileset=gts)
    out = str(tmp_path / 'shared.gtm')
    metrics = encode_streaming(iter(frames), cfg2, out, fps=24.0,
                               fast_lzma=True, chunk=4)
    assert metrics['shared_tileset'] == len(gts_tiles)
    assert metrics['n_keyframes'] >= 2
    assert metrics['max_buffered_frames'] < len(frames)

    blob = open(out, 'rb').read()
    parsed = parse_gtm(blob)
    assert parsed.header.kf_count == metrics['n_keyframes']
    stream = interpret_commands(parsed)
    # exactly the shared tileset, referenced globally by every keyframe
    assert stream.tiles.shape[0] == len(gts_tiles)
    for f in stream.frames:
        assert (f.tile_idx < len(gts_tiles)).all()
    dec, _ = decode_video(blob)
    assert dec.shape == frames.shape
    assert float(psnr(dec, frames)) > 15.0


def test_streaming_non_multiple_of_8_and_empty(rng, tmp_path):
    """The online detector must see tile-grid-CROPPED frames like the
    batch path (review r3): odd dimensions stay byte-identical. Empty
    input raises a clean ValueError."""
    import pytest

    from tiler_tpu.parallel.distributed import encode_gop_sharded
    frames = _multishot(rng, f=10, h=50, w=67)  # crops to 48x64
    cfg = EncoderConfig(palette_count=8, tile_palette_size=16,
                        max_tiles=120)
    want = encode_gop_sharded(frames, cfg, n_hosts=1, fps=24.0,
                              fast_lzma=True)
    out = str(tmp_path / 'odd.gtm')
    encode_streaming(iter(frames), cfg, out, fps=24.0, fast_lzma=True,
                     chunk=3)
    assert open(out, 'rb').read() == want

    with pytest.raises(ValueError, match='no frames'):
        encode_streaming(iter([]), cfg, str(tmp_path / 'e.gtm'))
