"""Bounded-memory streaming encode for arbitrarily long clips.

The reference (and our batch path) loads the whole clip into RAM
(btnLoadClick, /root/reference/main.pas:984-1166). This module encodes a
frame ITERATOR instead: keyframes are detected online (bit-identical
boundaries — the batch detector's EWMA resets at every keyframe, so
chunked feeding changes nothing, load.keyframes_from_correlations), each
completed GOP is encoded independently with its own tileset segment (the
container form of parallel.distributed.encode_gop_sharded), and its
compressed stream is appended to disk immediately. RAM high-water is one
GOP plus one detector chunk; the budget guard
(SHOT_TRANS_MAX_TILES_PER_KF) bounds GOP length, so memory is O(1) in
clip length.

Output is BYTE-IDENTICAL to encode_gop_sharded(frames, n_hosts=1) on the
same frames (asserted by test): same boundaries, same per-GOP encodes,
same container. The only whole-clip datum — the total tile count in the
SET_DIMENSIONS header command — is resolved by keeping the FIRST GOP's
payload raw until finalize (every decoder grows its tile store on
gtTileSet segments, but the hint is emitted exactly anyway).
"""
from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np

from ..bitstream.gtm import (GTMKeyFrameInfo, GTMWriter,
                             build_keyframe_stream, compress_keyframe_stream)
from ..constants import (MAX_TILEMAP_H, MAX_TILEMAP_W,
                         SHOT_TRANS_AVG_FRAMES, SHOT_TRANS_GRACE_PERIOD,
                         SHOT_TRANS_HARD_THRES, SHOT_TRANS_MAX_TILES_PER_KF,
                         SHOT_TRANS_SOFT_THRES, TILE_W)


class OnlineKeyframeDetector:
    """Chunk-fed shot detection with the exact batch recurrence
    (load.keyframes_from_correlations). feed() returns the GLOBAL frame
    indices that start a new keyframe within the fed chunk."""

    def __init__(self, tilemap_size: int):
        self.tilemap_size = tilemap_size
        self._prev = None      # last frame of the previous chunk
        self._i = 0            # global index of the next frame to judge
        self._av = -1.0
        self._last_kf = 0

    def feed(self, frames: np.ndarray) -> list[int]:
        from ..ops import stats
        if len(frames) == 0:
            return []
        starts = []
        if self._prev is None:
            self._prev = frames[0]
            self._i = 1
            frames = frames[1:]
            if len(frames) == 0:
                return []
        stack = np.concatenate([self._prev[None], frames])
        corr = np.asarray(stats.interframe_correlations(stack))
        for j in range(len(frames)):
            i = self._i
            v = float(corr[j])
            if self._av == -1.0:
                self._av = v
            else:
                self._av = self._av * (1.0 - 1.0 / SHOT_TRANS_AVG_FRAMES) \
                    + v * (1.0 / SHOT_TRANS_AVG_FRAMES)
            ratio = max(0.01, v) / max(0.01, self._av)
            is_kf = (ratio < SHOT_TRANS_HARD_THRES) or \
                (ratio < SHOT_TRANS_SOFT_THRES and
                 (i - self._last_kf + 1) > SHOT_TRANS_GRACE_PERIOD) or \
                ((i - self._last_kf + 1) * self.tilemap_size
                 > SHOT_TRANS_MAX_TILES_PER_KF)
            if is_kf:
                starts.append(i)
                self._av = -1.0
                self._last_kf = i
            self._i += 1
        self._prev = frames[-1]
        return starts


def _encode_gop(config, gop_frames: np.ndarray, fps: float, mesh=None):
    """One GOP as an independent single-keyframe encode (the
    parallel.distributed.encode_gop_partition body); mesh shards the
    frame-axis-parallel stages (byte-identical, parallel.mesh_pipeline)."""
    from .encoder import Encoder
    enc = Encoder(config, mesh=mesh)
    enc.load(gop_frames, fps=fps)
    enc.state.keyframes = np.array([[0, len(gop_frames) - 1]], np.int32)
    enc.dither()
    enc.make_unique()
    enc.global_tiling()
    enc.frame_tiling()
    enc.reindex()
    enc.smooth()
    st = enc.state
    n_act = int(st.tile_active.sum())
    return st, n_act


def encode_streaming(frames_iter, config, out_path: str, fps: float = 24.0,
                     fast_lzma: bool = False, chunk: int = 64,
                     mesh=None) -> dict:
    """Encode an iterator/iterable of [H,W,3] uint8 frames to out_path
    with bounded memory. mesh: optional device mesh for the per-GOP
    encodes (stream + --devices compose; byte-identical either way).
    Returns metrics (n_frames, n_keyframes, gtm_bytes,
    max_buffered_frames).

    Two-pass global-tileset mode: when config.reload_tileset names a GTS
    file (the reference's ReloadPreviousTiling workflow,
    main.pas:4372-4470 — e.g. produced by a batch encode of sampled
    frames with --gts-out), every GOP maps onto that FIXED tileset: the
    tileset is emitted ONCE in the first stream, tilemaps reference the
    shared global indices, and streaming regains cross-GOP tile sharing
    while staying O(one GOP) in memory."""
    if config.reload_tileset:
        return _encode_streaming_reload(frames_iter, config, out_path,
                                        fps, fast_lzma, chunk, mesh)
    det = None
    buf: list[np.ndarray] = []
    buf_start = 0
    total = 0
    max_buf = 0
    kf_index = 0
    tile_offset = 0
    gop0 = None          # (start, end, palettes, frame_dicts, tiles)
    infos: list[GTMKeyFrameInfo] = []
    kf_counts: list[int] = []
    dims = {}

    tmp_fd, tmp_path = tempfile.mkstemp(
        prefix=os.path.basename(out_path) + '.streams.')
    tmp = os.fdopen(tmp_fd, 'wb')

    def process_gop(start: int, end: int) -> None:
        nonlocal kf_index, tile_offset, gop0
        gop = np.stack(buf[:end - start + 1])
        st, n_act = _encode_gop(config, gop, fps, mesh=mesh)
        dims.setdefault('w', st.screen_w)
        dims.setdefault('h', st.screen_h)
        frames_d = [dict(tile_idx=st.stm_tile[f].ravel() + tile_offset,
                         pal_idx=st.stm_pal[f].ravel(),
                         hmir=st.stm_h[f].ravel(),
                         vmir=st.stm_v[f].ravel(),
                         smoothed=st.stm_smooth[f].ravel())
                    for f in range(st.n_frames)]
        payload = (start, end, st.palettes_rgb[0],
                   frames_d, st.tiles_pal[:n_act].copy())
        kf_counts.append(end - start + 1)
        if kf_index == 0:
            # held raw until the total tile count is known (the
            # SET_DIMENSIONS prefix lives in stream 0)
            gop0 = payload
        else:
            raw = build_keyframe_stream(
                [], payload[2], frames_d,
                (tile_offset, payload[4]), config.tile_palette_size)
            comp = compress_keyframe_stream(raw, fast_lzma=fast_lzma,
                                            lzma_mode=config.lzma_mode)
            tmp.write(comp)
            infos.append(GTMKeyFrameInfo(
                kf_index=kf_index, frame_index=start, raw_size=len(raw),
                compressed_size=len(comp),
                timecode_ms=int(round(1000.0 * start / fps))))
        tile_offset += n_act
        kf_index += 1

    try:
        it = iter(frames_iter)
        done = False
        while not done:
            chunk_frames = []
            for _ in range(chunk):
                try:
                    chunk_frames.append(np.asarray(next(it)))
                except StopIteration:
                    done = True
                    break
            if chunk_frames:
                arr = np.stack(chunk_frames)
                if det is None:
                    th = min(arr.shape[1] // TILE_W, MAX_TILEMAP_H)
                    tw = min(arr.shape[2] // TILE_W, MAX_TILEMAP_W)
                    det = OnlineKeyframeDetector(th * tw)
                starts = det.feed(arr)
                buf.extend(chunk_frames)
                total += len(chunk_frames)
                max_buf = max(max_buf, len(buf))
                for s in starts:
                    process_gop(buf_start, s - 1)
                    del buf[: s - buf_start]
                    buf_start = s
        if buf:
            process_gop(buf_start, total - 1)
            buf.clear()
        tmp.close()

        # finalize: stream 0 (with the now-known tile total) + container
        assert gop0 is not None, 'no frames'
        writer = GTMWriter(
            width=dims['w'], height=dims['h'], fps=fps, tiles_pal=None,
            palette_size=config.tile_palette_size, frame_count=total,
            kf_count=kf_index, fast_lzma=fast_lzma,
            total_tile_count=tile_offset, lzma_mode=config.lzma_mode)
        raw0 = build_keyframe_stream(
            writer._pending, gop0[2], gop0[3], (0, gop0[4]),
            config.tile_palette_size)
        comp0 = compress_keyframe_stream(raw0, fast_lzma=fast_lzma,
                                         lzma_mode=config.lzma_mode)
        info0 = GTMKeyFrameInfo(
            kf_index=0, frame_index=gop0[0], raw_size=len(raw0),
            compressed_size=len(comp0),
            timecode_ms=int(round(1000.0 * gop0[0] / fps)))
        writer.kf_infos = [info0] + infos
        writer._kf_frames = kf_counts
        prefix = writer.finalize_container()
        with open(out_path, 'wb') as out:
            out.write(prefix)
            out.write(comp0)
            with open(tmp_path, 'rb') as sf:
                shutil.copyfileobj(sf, out)
        size = os.path.getsize(out_path)
    finally:
        try:
            tmp.close()
        except Exception:  # noqa: BLE001
            pass
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
    return dict(n_frames=total, n_keyframes=kf_index, gtm_bytes=size,
                max_buffered_frames=max_buf)


def _encode_streaming_reload(frames_iter, config, out_path: str,
                             fps: float, fast_lzma: bool, chunk: int,
                             mesh) -> dict:
    """Streaming encode against a FIXED global tileset (see
    encode_streaming docstring): the scaled GTS is emitted once, every
    GOP's tilemap maps onto its indices, no per-GOP tileset segments."""
    from ..bitstream.gtm import emit_tileset, read_gts

    gts_tiles, gts_pal_size = read_gts(config.reload_tileset)
    scaled = (gts_tiles.astype(np.int64) * config.tile_palette_size
              // gts_pal_size).astype(np.uint8)
    lut: dict[bytes, int] = {}
    for i, row in enumerate(scaled):
        lut.setdefault(row.tobytes(), i)

    det = None
    buf: list[np.ndarray] = []
    buf_start = 0
    total = 0
    max_buf = 0
    kf_index = 0
    infos: list[GTMKeyFrameInfo] = []
    kf_counts: list[int] = []
    dims = {}

    tmp_fd, tmp_path = tempfile.mkstemp(
        prefix=os.path.basename(out_path) + '.streams.')
    tmp = os.fdopen(tmp_fd, 'wb')

    def process_gop(start: int, end: int) -> None:
        nonlocal kf_index
        gop = np.stack(buf[:end - start + 1])
        st, n_act = _encode_gop(config, gop, fps, mesh=mesh)
        if not dims:
            dims['w'], dims['h'] = st.screen_w, st.screen_h
            dims['prefix'] = [emit_tileset(
                scaled, config.tile_palette_size,
                st.tilemap_w, st.tilemap_h, fps)]
        # every active tile's pixels ARE a scaled GTS line after the
        # reload path (run_reload_tiling overwrote them); map local
        # dense indices to the shared global ones
        lutarr = np.array([lut[st.tiles_pal[i].tobytes()]
                           for i in range(n_act)], np.int64)
        frames_d = [dict(tile_idx=lutarr[st.stm_tile[f].ravel()],
                         pal_idx=st.stm_pal[f].ravel(),
                         hmir=st.stm_h[f].ravel(),
                         vmir=st.stm_v[f].ravel(),
                         smoothed=st.stm_smooth[f].ravel())
                    for f in range(st.n_frames)]
        raw = build_keyframe_stream(
            dims['prefix'] if kf_index == 0 else [],
            st.palettes_rgb[0], frames_d, None, config.tile_palette_size)
        comp = compress_keyframe_stream(raw, fast_lzma=fast_lzma,
                                        lzma_mode=config.lzma_mode)
        tmp.write(comp)
        infos.append(GTMKeyFrameInfo(
            kf_index=kf_index, frame_index=start, raw_size=len(raw),
            compressed_size=len(comp),
            timecode_ms=int(round(1000.0 * start / fps))))
        kf_counts.append(end - start + 1)
        kf_index += 1

    try:
        it = iter(frames_iter)
        done = False
        while not done:
            chunk_frames = []
            for _ in range(chunk):
                try:
                    chunk_frames.append(np.asarray(next(it)))
                except StopIteration:
                    done = True
                    break
            if chunk_frames:
                arr = np.stack(chunk_frames)
                if det is None:
                    th = min(arr.shape[1] // TILE_W, MAX_TILEMAP_H)
                    tw = min(arr.shape[2] // TILE_W, MAX_TILEMAP_W)
                    det = OnlineKeyframeDetector(th * tw)
                starts = det.feed(arr)
                buf.extend(chunk_frames)
                total += len(chunk_frames)
                max_buf = max(max_buf, len(buf))
                for s in starts:
                    process_gop(buf_start, s - 1)
                    del buf[: s - buf_start]
                    buf_start = s
        if buf:
            process_gop(buf_start, total - 1)
            buf.clear()
        tmp.close()

        assert infos, 'no frames'
        writer = GTMWriter(
            width=dims['w'], height=dims['h'], fps=fps, tiles_pal=None,
            palette_size=config.tile_palette_size, frame_count=total,
            kf_count=kf_index, fast_lzma=fast_lzma,
            total_tile_count=len(scaled), lzma_mode=config.lzma_mode)
        writer.kf_infos = infos
        writer._kf_frames = kf_counts
        prefix = writer.finalize_container()
        with open(out_path, 'wb') as out:
            out.write(prefix)
            with open(tmp_path, 'rb') as sf:
                shutil.copyfileobj(sf, out)
        size = os.path.getsize(out_path)
    finally:
        try:
            tmp.close()
        except Exception:  # noqa: BLE001
            pass
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
    return dict(n_frames=total, n_keyframes=kf_index, gtm_bytes=size,
                max_buffered_frames=max_buf, shared_tileset=len(scaled))


def iter_frames_npy(path: str):
    """Lazy frame iterator over a [F,H,W,3] .npy (memory-mapped)."""
    arr = np.load(path, mmap_mode='r')
    for i in range(arr.shape[0]):
        yield np.asarray(arr[i])


def iter_frames_pngs(pattern: str):
    """Lazy frame iterator over a sorted PNG glob."""
    import glob

    from PIL import Image
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    for p in paths:
        yield np.asarray(Image.open(p).convert('RGB'))
