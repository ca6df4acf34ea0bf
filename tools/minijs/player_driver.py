"""Run the UNMODIFIED reference GTM JS player under the mini-JS engine and
return every decoded frame as numpy RGB — the conformance oracle for
repo-encoded streams (pixel-compare vs tiler_tpu.decode.decode_video).

Mirrors tools/js_conformance/harness.html for real browsers: wraps the
player's global `readCommand` to count FrameEnd commands, forces the LZMA
byte-rate high so every decodeFrame tick completes exactly one frame, and
snapshots the player's working ImageData after each frame.
"""
from __future__ import annotations

import os

import numpy as np

from .engine import (ArrayBuffer, Interpreter, JSException, NativeFunction,
                     TypedArray, js_tonumber)
from .host import BrowserHost, imagedata_rgba

REF_DIR = '/root/reference/decoders/htmljs'


class PlayerVM:
    """One loaded player (scripts parsed+executed once, reusable per run)."""

    def __init__(self, ref_dir: str = REF_DIR, verbose: bool = False):
        self.interp = Interpreter()
        log = print if verbose else None
        self.host = BrowserHost(self.interp, log=log)
        for name in ('lzma.js', 'lzma.shim.js', 'gtm.player.js'):
            src = open(os.path.join(ref_dir, name)).read()
            self.interp.run(src)

    def play(self, gtm_bytes: bytes, max_frames: int = 100000,
             native_lzma: bool = False) -> np.ndarray:
        """Decode a whole GTM through the reference player; returns frames
        [F, H, W, 3] uint8 (the player's working ImageData after each
        FrameEnd, which is what putImageData shows next tick).

        native_lzma=True swaps the player's LZMA.decodeMaxSize library
        seam for tiler_tpu's native LZMA1 decoder (byte-equality of the
        two decoders is asserted separately on the same stream by
        test_golden_reference_stream): the UNMODIFIED player code —
        header parse, command interpreter, drawing — then runs at native
        inflate speed, which makes multi-MB reference streams playable
        in test time (interpreted js-lzma costs ~300 s/MB here)."""
        it = self.interp
        g = it.globals
        lzma_obj = g['LZMA']
        orig_decode_max = lzma_obj.get('decodeMaxSize')
        if native_lzma:
            lzma_obj.props['decodeMaxSize'] = self._native_decode_max()

        # fresh playback state (the page-load state of the player globals)
        # — including the fake canvas dims: redimFrame only rebuilds its
        # ImageData when the dims CHANGE, so playing two same-sized
        # streams back-to-back on one VM would otherwise leave the
        # nulled gtmTMImageData un-recreated
        for canvas in self.host.canvases.values():
            canvas.props['width'] = 0.0
            canvas.props['height'] = 0.0
        g['gtmCanvasId'] = 'frame'
        g['gtmReady'] = False
        g['gtmPlaying'] = True
        g['gtmHeader'] = None
        g['gtmLzmaDecoder'] = it.construct(g['LZMA'].get('Decoder'), [])
        g['gtmLzmaBytesPerSecond'] = 1e15
        g['gtmFrameData'] = None
        g['gtmTMImageData'] = None
        g['gtmDataPos'] = 0.0
        g['gtmWidth'] = 0.0
        g['gtmHeight'] = 0.0
        g['gtmFrameLength'] = 0.0
        g['gtmTiles'] = None
        g['gtmTileCount'] = 0.0
        g['gtmPalSize'] = 0.0
        g['gtmTMPos'] = 0.0
        g['gtmLoopCount'] = 0.0

        # count FrameEnd commands by wrapping the global readCommand
        frame_ends = [0]
        orig_read = g['readCommand']
        gtm_cmd = g['GTMCommand']

        def counting_read(this, args):
            c = it.call(orig_read, [])
            if c.items and c.items[0] == gtm_cmd.get('FrameEnd'):
                frame_ends[0] += 1
            return c
        g['readCommand'] = NativeFunction('readCommand', counting_read)

        # neutralize the decodeFrame self-rescheduling path: we drive it
        orig_decode = g['decodeFrame']

        try:
            g['gtmInStream'] = it.construct(
                g['LZMA'].get('iStream'), [ArrayBuffer(bytearray(gtm_bytes))])
            it.call(g['startFromReader'], [])

            frames = []
            guard = 0
            stall = 0
            while js_tonumber(g['gtmLoopCount']) == 0 and \
                    len(frames) < max_frames and guard < 2 * max_frames + 64:
                guard += 1
                g['gtmLzmaBytesPerSecond'] = 1e15
                before = frame_ends[0]
                it.call(orig_decode, [])
                if frame_ends[0] > before:
                    stall = 0
                    img = g['gtmTMImageData']
                    frames.append(imagedata_rgba(img)[..., :3])
                else:
                    # zero-progress ticks happen at keyframe boundaries
                    # while unpackData feeds the next LZMA stream; a long
                    # stall means the stream is truly exhausted/stuck
                    stall += 1
                    if stall > 16:
                        break
        finally:
            # a PlayerVM is reused across tests: a mid-playback throw must
            # not leave the wrapped readCommand / swapped LZMA seam in
            # place for the next play()
            g['readCommand'] = orig_read
            if native_lzma:
                lzma_obj.props['decodeMaxSize'] = orig_decode_max
        if not frames:
            raise JSException('player produced no frames')
        return np.stack(frames)

    def _native_decode_max(self) -> NativeFunction:
        """LZMA.decodeMaxSize(decoder, inStream, outStream, maxSize)
        replacement: inflate ONE whole LZMA-alone stream per call with
        tiler_tpu's native decoder, advancing inStream.offset by the
        exact consumed bytes; returns an oStream-shaped object whose
        toUint8Array() yields everything inflated so far (the player
        accumulates streams across keyframes), or null when the input is
        exhausted. The harness drives the player with an unbounded byte
        rate, so whole-stream granularity matches the real shim's
        observable behavior."""
        from tiler_tpu.native import lzma_decode_alone
        acc = bytearray()

        def decode_max(this, args):
            in_stream, out_stream = args[1], args[2]
            data = in_stream.get('array').data
            off = int(js_tonumber(in_stream.get('offset')))
            if off >= len(data):
                return None
            chunk, consumed = lzma_decode_alone(bytes(data[off:]))
            in_stream.props['offset'] = float(off + consumed)
            acc.extend(chunk)
            # the real decodeMaxSize fills the PASSED oStream as a side
            # effect (startFromReader ignores the return value and reads
            # gtmOutStream directly) — shadow its toUint8Array on the
            # instance so both call sites see the inflated bytes without
            # an interpreted 3.5 MB buffer-concat loop
            snapshot = TypedArray(bytearray(acc))
            out_stream.props['toUint8Array'] = NativeFunction(
                'toUint8Array', lambda _this, _args: snapshot)
            return out_stream

        return NativeFunction('decodeMaxSize', decode_max)


def play_gtm(gtm_bytes: bytes, verbose: bool = False) -> np.ndarray:
    return PlayerVM(verbose=verbose).play(gtm_bytes)
