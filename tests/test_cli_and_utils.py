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


def test_preview_views_and_cli(rng, tmp_path):
    """Tiles-page/palette-strip renderers + the CLI preview command
    (the GUI's 4 preview tabs, main.pas:3305-3493)."""
    from tiler_tpu.render import render_palette_strip, render_tiles_page
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.run_all(_clip(rng), fast_lzma=True)
    st = enc.state
    tp = render_tiles_page(st, 0, page=0, pal_idx=0)
    assert tp.shape == (32, 48, 3)
    # cells past the tileset are clAqua
    n_act = len(st.tiles_pal)
    if n_act < st.tilemap_size:
        assert (tp[-8:, -8:] == [0, 255, 255]).all()
    strip = render_palette_strip(st, 0)
    assert strip.shape == (4, 16, 3)

    ck = str(tmp_path / 'st.npz')
    save_checkpoint(ck, st)
    r = subprocess.run(
        [sys.executable, '-m', 'tiler_tpu', 'preview', ck,
         str(tmp_path / 'pv'), '--frame', '1'],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
             'PYTHONPATH': '/root/repo', 'HOME': '/root'})
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert 0.0 < out['correlation'] <= 1.0
    for key in ('source', 'output', 'tiles', 'palette'):
        assert (tmp_path / 'pv' / out[key]).exists()


def test_cli_debug_harness(capsys):
    """`tiler_tpu debug` — the F12 smoke harness (main.pas:1274-1315):
    seeded palette via the reference LCG, Yliluoma plans, HSV sweep,
    DL3 of the sweep."""
    from tiler_tpu.__main__ import main
    assert main(['debug']) == 0
    out = capsys.readouterr().out
    assert "palette: ['5165a8'" in out  # exact Delphi LCG sequence
    assert 'yliluoma ff8000' in out
    assert 'hsv roundtrip:' in out
    assert 'dl3 sweep palette' in out


def test_checkpoint_save_keeps_device_residency(rng, tmp_path):
    """save_checkpoint must not flip tiles_pal authority to host: under
    --auto-checkpoint that would silently downgrade the remaining steps
    to the host path."""
    import jax.numpy as jnp
    from tiler_tpu.pipeline.state import EncoderState
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.load(_clip(rng))
    enc.dither()  # leaves the device side authoritative
    st = enc.state
    assert st._tiles_pal_dev is not None and st._tiles_pal_host is None
    save_checkpoint(str(tmp_path / 'ck.npz'), st)
    assert st._tiles_pal_host is None  # authority unchanged
    loaded = load_checkpoint(str(tmp_path / 'ck.npz'))
    np.testing.assert_array_equal(loaded.tiles_pal,
                                  np.array(st._tiles_pal_dev))


def test_cli_auto_checkpoint_crash_recovery(rng, tmp_path):
    """--auto-checkpoint failure recovery: a crash mid-pipeline (fault
    injected after global_tiling) resumes from the next step and produces
    the byte-identical stream of an uninterrupted encode."""
    clip_path = str(tmp_path / 'clip.npy')
    np.save(clip_path, _clip(rng))
    env = {'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': '/root/repo', 'HOME': '/root'}
    env_cmd = [sys.executable, '-m', 'tiler_tpu']
    args = ['--palette-count', '4', '--fast-lzma']

    ref_gtm = str(tmp_path / 'ref.gtm')
    r = subprocess.run(env_cmd + ['encode', clip_path, ref_gtm] + args,
                       capture_output=True, text=True, cwd='/root/repo',
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    # checkpoint path WITHOUT .npz: np.savez appends the suffix, and the
    # resume probe/cleanup must still find the file
    gtm = str(tmp_path / 'out.gtm')
    ckpt = str(tmp_path / 'auto.ck')
    r = subprocess.run(
        env_cmd + ['encode', clip_path, gtm, '--auto-checkpoint', ckpt]
        + args,
        capture_output=True, text=True, cwd='/root/repo',
        env=dict(env, TILER_CRASH_AFTER_STEP='global_tiling'))
    assert r.returncode == 13, (r.returncode, r.stderr[-2000:])
    assert not (tmp_path / 'out.gtm').exists()
    assert (tmp_path / 'auto.ck.npz').exists()

    r = subprocess.run(
        env_cmd + ['encode', clip_path, gtm, '--auto-checkpoint', ckpt]
        + args,
        capture_output=True, text=True, cwd='/root/repo', env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'resuming at step' in r.stdout
    assert not (tmp_path / 'auto.ck.npz').exists()  # removed on completion
    assert open(gtm, 'rb').read() == open(ref_gtm, 'rb').read()

    # crash after the FINAL step's hook (checkpoint says 'save' but the
    # output was never written): resume must clamp to end_step, re-run
    # save alone, and still produce the identical stream
    gtm2 = str(tmp_path / 'out2.gtm')
    r = subprocess.run(
        env_cmd + ['encode', clip_path, gtm2, '--auto-checkpoint', ckpt]
        + args,
        capture_output=True, text=True, cwd='/root/repo',
        env=dict(env, TILER_CRASH_AFTER_STEP='save'))
    assert r.returncode == 13
    assert not (tmp_path / 'out2.gtm').exists()
    r = subprocess.run(
        env_cmd + ['encode', clip_path, gtm2, '--auto-checkpoint', ckpt]
        + args,
        capture_output=True, text=True, cwd='/root/repo', env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming at step 'save'" in r.stdout
    assert open(gtm2, 'rb').read() == open(ref_gtm, 'rb').read()


def test_cli_serve_stages_and_serves(tmp_path):
    """`serve` stages the demo page + stream and answers HTTP."""
    import http.client
    import threading
    import time as _time

    from tiler_tpu.__main__ import main as cli_main
    from tiler_tpu.bitstream.gtm import GTMWriter
    import numpy as np
    rng = np.random.default_rng(0)
    wr = GTMWriter(width=16, height=16, fps=24.0,
                   tiles_pal=rng.integers(0, 16, (4, 8, 8), np.uint8),
                   palette_size=16, frame_count=1, kf_count=1)
    wr.add_keyframe(0, 0, 0, rng.integers(0, 255, (1, 16, 3), np.uint8),
                    [dict(tile_idx=np.arange(4) % 4,
                          pal_idx=np.zeros(4, np.int64),
                          hmir=np.zeros(4, bool), vmir=np.zeros(4, bool),
                          smoothed=np.zeros(4, bool))])
    gtm = tmp_path / 's.gtm'
    gtm.write_bytes(wr.tobytes())

    th = threading.Thread(target=cli_main,
                          args=(['serve', str(gtm), '--port', '8719'],),
                          daemon=True)
    th.start()
    deadline = _time.time() + 10
    last = None
    while _time.time() < deadline:
        try:
            conn = http.client.HTTPConnection('127.0.0.1', 8719, timeout=2)
            conn.request('GET', '/index.html')
            r = conn.getresponse()
            body = r.read()
            assert r.status == 200 and b'gtm_player.js' in body
            conn.request('GET', '/stream.gtm')
            r2 = conn.getresponse()
            assert r2.status == 200 and len(r2.read()) == gtm.stat().st_size
            conn.request('GET', '/gtm_player.js')
            assert conn.getresponse().status == 200
            return
        except (ConnectionRefusedError, OSError) as e:
            last = e
            _time.sleep(0.3)
    raise AssertionError(f'server never came up: {last}')


def test_config_defaults_match_lfm():
    """Shipped-form default parity (main.lfm): gammas at 400/412, palette
    shape, smoothing, VAR, Yliluoma mix, DL BPC."""
    cfg = EncoderConfig()
    assert cfg.encoder_gamma == 1.8 and cfg.visual_gamma == 0.5
    assert cfg.tile_palette_size == 16 and cfg.palette_count == 128
    assert cfg.smoothing_strength == 0.020 and cfg.pal_var == 0.95
    assert cfg.yliluoma_mix == 4 and cfg.dl3_bpc == 7


def test_lzma_midfile_corruption_raises():
    """A corrupt non-final stream must raise, not silently truncate the
    video (advisor r2); a corrupt FIRST stream still yields nothing and
    lets parse_gtm produce the uniform error."""
    import pytest
    from tiler_tpu.bitstream.lzma_codec import (
        lzma_compress_alone, lzma_decompress_concat)
    s1 = lzma_compress_alone(b'alpha' * 40, fast=True)
    s2 = lzma_compress_alone(b'beta' * 40, fast=True)
    assert lzma_decompress_concat(s1 + s2) == b'alpha' * 40 + b'beta' * 40
    corrupt2 = bytearray(s2)
    corrupt2[20] ^= 0xFF
    try:
        out = lzma_decompress_concat(s1 + bytes(corrupt2))
    except ValueError:
        pass  # raised mid-file: correct
    else:
        # liblzma may tolerate a body flip; output must then not be a
        # silent one-stream truncation
        assert out != b'alpha' * 40
    # hard mid-file corruption (invalid props byte region)
    with pytest.raises(ValueError):
        lzma_decompress_concat(s1 + b'\xff' * 20)
    assert lzma_decompress_concat(b'\xff' * 20) == b''


def test_checkpoint_tmp_unique_and_crash_safe(rng, tmp_path, monkeypatch):
    """A stale tmp from an earlier crash must not break or be clobbered by
    the next save (advisor r2)."""
    import os
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.load(_clip(rng))
    p = str(tmp_path / 'ck.npz')
    stale = str(tmp_path / 'ck.npz.tmp.stale.npz')
    with open(stale, 'wb') as fh:
        fh.write(b'garbage')
    save_checkpoint(p, enc.state)
    st = load_checkpoint(p)
    np.testing.assert_array_equal(st.frames_rgb, enc.state.frames_rgb)
    assert os.path.exists(stale)  # untouched
    # no leftover tmp after a successful save
    tmps = [f for f in os.listdir(tmp_path)
            if '.tmp.' in f and f != os.path.basename(stale)]
    assert tmps == []


def test_render_tiles_page_out_of_range_args(rng):
    """--palette / --page beyond range clamp instead of wrapping or
    raising (advisor r2)."""
    from tiler_tpu.render import render_tiles_page
    enc = Encoder(EncoderConfig(palette_count=4, tile_palette_size=16))
    enc.load(_clip(rng))
    enc.dither()
    enc.make_unique()
    img_hi = render_tiles_page(enc.state, pal_idx=9999)
    img_last = render_tiles_page(enc.state, pal_idx=3)
    np.testing.assert_array_equal(img_hi, img_last)
    img_neg = render_tiles_page(enc.state, page=-5)
    np.testing.assert_array_equal(img_neg, render_tiles_page(enc.state, page=0))
    far = render_tiles_page(enc.state, page=10**6)
    assert (far == np.array([0, 255, 255], np.uint8)).all()
