"""CLI, checkpoint/resume, preview renderer."""
import json
import subprocess
import sys

import numpy as np

from tiler_tpu.config import EncoderConfig
from tiler_tpu.pipeline.encoder import Encoder
from tiler_tpu.render import (reconstruction_correlation, render_frame)
from tiler_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _clip(rng, f=3, h=32, w=48):
    frames = np.zeros((f, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(f):
        frames[i] = np.clip(
            ((xx * 4 + i * 3) % 256)[..., None] * np.array([1, .7, .4])
            + rng.normal(0, 5, (h, w, 3)), 0, 255)
    return frames


def test_checkpoint_roundtrip(rng, tmp_path):
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.load(_clip(rng))
    enc.dither()
    p = str(tmp_path / 'ck.npz')
    save_checkpoint(p, enc.state)
    st = load_checkpoint(p)
    np.testing.assert_array_equal(st.tiles_pal, enc.state.tiles_pal)
    np.testing.assert_array_equal(st.tm_pal, enc.state.tm_pal)
    assert st.config.palette_count == 4
    # resumed state continues through the pipeline
    enc2 = Encoder(st.config)
    enc2.state = st
    enc2.make_unique()
    enc2.reindex()
    blob = enc2.save(fast_lzma=True)
    assert blob[:4] == b'GTMv'


def test_render_matches_decoded_bitstream(rng):
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    frames = _clip(rng)
    blob = enc.run_all(frames, fast_lzma=True)
    from tiler_tpu.decode import decode_video
    dec, _ = decode_video(blob)
    for f in range(len(frames)):
        np.testing.assert_array_equal(render_frame(enc.state, f), dec[f])
    corr = reconstruction_correlation(enc.state, 0)
    assert 0.5 < corr <= 1.0


def test_cli_encode_decode_info(rng, tmp_path):
    clip_path = str(tmp_path / 'clip.npy')
    gtm_path = str(tmp_path / 'out.gtm')
    out_path = str(tmp_path / 'dec.npy')
    np.save(clip_path, _clip(rng))
    env_cmd = [sys.executable, '-m', 'tiler_tpu']

    r = subprocess.run(
        env_cmd + ['encode', clip_path, gtm_path, '--palette-count', '4',
                   '--fast-lzma'],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
             'PYTHONPATH': '/root/repo',
             'HOME': '/root'})
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics['gtm_bytes'] > 0

    r = subprocess.run(env_cmd + ['info', gtm_path], capture_output=True,
                       text=True, cwd='/root/repo',
                       env={'PATH': '/usr/bin:/bin', 'PYTHONPATH': '/root/repo',
                            'HOME': '/root'})
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info['frames'] == 3

    r = subprocess.run(env_cmd + ['decode', gtm_path, out_path],
                       capture_output=True, text=True, cwd='/root/repo',
                       env={'PATH': '/usr/bin:/bin', 'PYTHONPATH': '/root/repo',
                            'HOME': '/root'})
    assert r.returncode == 0, r.stderr[-2000:]
    dec = np.load(out_path)
    assert dec.shape == (3, 32, 48, 3)
