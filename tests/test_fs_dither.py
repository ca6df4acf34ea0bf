"""Sub-8bpc Floyd-Steinberg paths: native C++ == Python fallback ==
transliterated oracle (main.pas:1966-1996 / 1877-1929)."""
import numpy as np
import pytest

from reference_impls import dither_floyd_steinberg_oracle
from tiler_tpu import native
from tiler_tpu.ops import dither


@pytest.mark.parametrize('bits', [4, 6, 7])
def test_frame_posterize_matches_oracle(rng, bits):
    frame = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
    want = dither_floyd_steinberg_oracle(frame, bits)
    got = dither.floyd_steinberg_posterize(frame, bits)
    np.testing.assert_array_equal(got, want)
    if native.available():
        np.testing.assert_array_equal(native.fs_posterize(frame, bits), want)


def test_frame_posterize_python_fallback_matches_native(rng, monkeypatch):
    if not native.available():
        pytest.skip('no native lib')
    frame = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    want = native.fs_posterize(frame, 5)
    monkeypatch.setattr(native, 'available', lambda: False)
    got = dither.floyd_steinberg_posterize(frame, 5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('bits', [4, 7])
def test_tile_fs_native_matches_python(rng, bits, monkeypatch):
    if not native.available():
        pytest.skip('no native lib')
    tile = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    got_native = dither.dither_tile_floyd_steinberg(tile, bits)
    monkeypatch.setattr(native, 'available', lambda: False)
    got_py = dither.dither_tile_floyd_steinberg(tile, bits)
    np.testing.assert_array_equal(got_native, got_py)


def test_posterize_8bpc_identity(rng):
    frame = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    assert dither.floyd_steinberg_posterize(frame, 8) is frame


def test_native_frame_speed_is_sane(rng):
    """The knob is usable: a 1080p frame diffuses in well under a second
    natively (the Python loop takes minutes)."""
    if not native.available():
        pytest.skip('no native lib')
    import time
    frame = rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
    t0 = time.perf_counter()
    native.fs_posterize(frame, 7)
    assert time.perf_counter() - t0 < 2.0
