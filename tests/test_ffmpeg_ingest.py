"""ffmpeg ingestion (main.pas:4765-4800 equivalent): argv construction,
fps scrape on real ffmpeg stderr shapes, and the full frames_from_video
flow with a faked ffmpeg process (the test env has no ffmpeg binary; a
real-binary test runs when one is present)."""
import os
import shutil
import subprocess

import numpy as np
import numpy.testing  # noqa: F401  (load before subprocess is monkeypatched:
# its first import shells out to probe CPU features)
import pytest

from tiler_tpu.pipeline import load as L


def test_ffmpeg_args_range_and_scale():
    args = L.ffmpeg_args('in.mp4', '/tmp/x/%04d.png', start_frame=10,
                         frame_count=5, scale=0.5)
    vf = args[args.index('-vf') + 1]
    assert 'between(n\\,10\\,14)' in vf
    assert 'scale=iw*0.5:ih*0.5:flags=lanczos' in vf
    assert 'out_range=full' in vf
    assert args[-1] == '/tmp/x/%04d.png'
    assert args[args.index('-pix_fmt') + 1] == 'rgb24'


def test_ffmpeg_args_open_range():
    args = L.ffmpeg_args('v.avi', 'o/%04d.png')
    vf = args[args.index('-vf') + 1]
    assert f'between(n\\,0\\,{2**30})' in vf


@pytest.mark.parametrize('stderr,expect', [
    ('Stream #0:0: Video: h264, yuv420p, 1280x720, 1074 kb/s, '
     '29.97 fps, 30 tbr, 90k tbn', 29.97),
    ('Stream #0:0(und): Video: mpeg4, 352x288 [SAR 1:1], 25 fps, '
     '25 tbr, 25 tbn', 25.0),
    ('Video: rawvideo, rgb24, 160x96, 23.976 fps, 23.98 tbr', 23.976),
    ('no rate info anywhere', 24.0),
    ('Video: h264, 640x480, 30 tbr, 90k tbn', 30.0),      # tbr fallback
    ('Duration: 00:00:10.00, start: 0.000000', 24.0),
])
def test_parse_ffmpeg_fps(stderr, expect):
    assert L.parse_ffmpeg_fps(stderr) == expect


def test_frames_from_video_with_fake_ffmpeg(monkeypatch, tmp_path, rng):
    """Full flow with the process runner faked: PNGs written to the
    requested pattern, fps scraped from canned stderr, frames stacked in
    order."""
    from PIL import Image
    from tiler_tpu.utils import progress
    monkeypatch.setattr(shutil, 'which', lambda name: '/fake/ffmpeg')
    src = rng.integers(0, 255, (3, 32, 48, 3)).astype(np.uint8)

    def fake_run(argv, echo=False, text=True, timeout=None):
        assert argv[0] == '/fake/ffmpeg'
        pattern = argv[-1]
        outdir = os.path.dirname(pattern)
        for i, fr in enumerate(src):
            Image.fromarray(fr).save(
                os.path.join(outdir, '%04d.png' % (i + 1)))
        return 0, '', 'Stream #0:0: Video: h264, 48x32, 29.97 fps, 30 tbr'

    monkeypatch.setattr(progress, 'run_command', fake_run)
    frames, fps = L.frames_from_video('whatever.mp4', frame_count=3)
    assert fps == 29.97
    np.testing.assert_array_equal(frames, src)


def test_frames_from_video_ffmpeg_failure(monkeypatch):
    from tiler_tpu.utils import progress
    monkeypatch.setattr(shutil, 'which', lambda name: '/fake/ffmpeg')
    monkeypatch.setattr(
        progress, 'run_command',
        lambda argv, echo=False, text=True, timeout=None:
        (1, '', 'in.mp4: No such file or directory'))
    with pytest.raises(RuntimeError, match='ffmpeg failed'):
        L.frames_from_video('in.mp4')


def test_frames_from_video_no_binary(monkeypatch):
    monkeypatch.setattr(shutil, 'which', lambda name: None)
    with pytest.raises(RuntimeError, match='not available'):
        L.frames_from_video('in.mp4')


@pytest.mark.skipif(shutil.which('ffmpeg') is None,
                    reason='no ffmpeg binary in this environment')
def test_frames_from_video_real_binary(tmp_path, rng):
    """When ffmpeg exists: synthesize a clip with lavfi and ingest it."""
    out = str(tmp_path / 'clip.mp4')
    subprocess.run(['ffmpeg', '-y', '-f', 'lavfi',
                    '-i', 'testsrc=duration=1:size=160x96:rate=8', out],
                   check=True, capture_output=True)
    frames, fps = L.frames_from_video(out, frame_count=4)
    assert frames.shape[0] == 4 and frames.shape[1:] == (96, 160, 3)
    assert fps == 8.0


def test_open_video_stream_with_fake_ffmpeg(monkeypatch, tmp_path, rng):
    """Pipe-based streaming ingestion: a fake ffmpeg executable serves
    both the 1-frame PNG probe and the rawvideo pipe; frames arrive in
    order with the probed dimensions and scraped fps."""
    src = rng.integers(0, 255, (5, 24, 40, 3)).astype(np.uint8)
    src_npy = str(tmp_path / 'src.npy')
    np.save(src_npy, src)
    fake = tmp_path / 'ffmpeg'
    fake.write_text(f"""#!/usr/bin/env python3
import os, re, sys
import numpy as np
frames = np.load({src_npy!r})
args = sys.argv[1:]
m = re.search(r'between\\(n\\\\,(\\d+)\\\\,(\\d+)\\)', ' '.join(args))
lo, hi = int(m.group(1)), int(m.group(2))
sel = frames[lo:hi + 1]
sys.stderr.write('Stream #0:0: Video: rawvideo, rgb24, 40x24, '
                 '25 fps, 25 tbr\\n')
if args[-1] == '-':
    sys.stdout.buffer.write(sel.tobytes())
else:
    from PIL import Image
    for i, fr in enumerate(sel):
        Image.fromarray(fr).save(args[-1] % (i + 1))
""")
    fake.chmod(0o755)
    monkeypatch.setattr(shutil, 'which', lambda name: str(fake))

    it, fps, (h, w) = L.open_video_stream('whatever.mp4')
    assert (h, w) == (24, 40)
    assert fps == 25.0
    got = np.stack(list(it))
    np.testing.assert_array_equal(got, src)

    # frame-range select honored through the pipe
    it2, _, _ = L.open_video_stream('x.mp4', start_frame=1, frame_count=3)
    np.testing.assert_array_equal(np.stack(list(it2)), src[1:4])


def test_open_video_stream_failure_raises(monkeypatch, tmp_path, rng):
    """A mid-stream ffmpeg death must raise (with stderr tail), never
    silently truncate (review r3)."""
    src = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    src_npy = str(tmp_path / 'src.npy')
    np.save(src_npy, src)
    fake = tmp_path / 'ffmpeg'
    fake.write_text(f"""#!/usr/bin/env python3
import sys
import numpy as np
frames = np.load({src_npy!r})
args = sys.argv[1:]
sys.stderr.write('Video: rawvideo, 16x16, 25 fps\\n')
if args[-1] == '-':
    sys.stdout.buffer.write(frames[:2].tobytes())
    sys.stderr.write('boom: decoder exploded\\n')
    sys.exit(1)
from PIL import Image
Image.fromarray(frames[0]).save(args[-1] % 1)
""")
    fake.chmod(0o755)
    monkeypatch.setattr(shutil, 'which', lambda name: str(fake))
    it, _fps, _hw = L.open_video_stream('x.mp4')
    with pytest.raises(RuntimeError, match='boom'):
        list(it)
