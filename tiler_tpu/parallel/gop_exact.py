"""Cross-host-consistent GOP-sharded encode (SURVEY.md §5.8 design).

The reference encoder is a single shared-memory process; its global
tileset is just an array every thread mutates (main.pas:364-390). This
module is the multi-host replacement: keyframe spans (GOPs) partition
across hosts, every per-keyframe phase (dither, frame tiling, smoothing)
runs purely host-locally, and the four global artifacts are kept
consistent with explicit collectives:

  (a) candidate-tile allgather  — each host contributes its dithered
      tiles before MakeUnique/GlobalTiling (tiles_pal u8 + dpi + use);
  (b) centroid allreduce        — KModes runs either replicated (the
      gathered set is identical on every host, and the solver is
      deterministic) or device-sharded with psum'd category counts
      (sharded_ops.sharded_kmodes, bit-identical by test);
  (c) tileset replication       — the reduced tileset broadcasts to every
      host for FrameTiling (the reference's shared kd-tree dataset);
  (d) use-count psum            — Reindex orders tiles by global use, the
      sum of per-host tilemap bincounts.

Because every global computation consumes only allgathered/psummed values
and is deterministic, **an N-host encode produces the byte-identical GTM
stream of the 1-host encoder** (tests/test_parallel.py asserts this for
2 and 3 hosts) — unlike distributed.encode_gop_sharded, which trades
exactness for zero cross-host traffic by giving each GOP its own tileset.

This module drives the partition in-process (the simulation is the
conformance artifact; hosts execute sequentially but only ever read their
own shard plus the gathered globals). A real deployment runs one
HostPartition per process with the gathers backed by
jax.experimental.multihost_utils.process_allgather — the exchange payloads
here are exactly the arrays such a deployment would move over DCN.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import TILE_W, equal_quality_tile_count
from .distributed import assign_gops_to_hosts


@dataclasses.dataclass
class HostPartition:
    """One host's shard of the encode: its GOPs' frames + tilemaps.

    g_frame[f_local] = global frame number; tile indices inside tm_* are
    LOCAL until to_global_tiles() after the dither phase, GLOBAL after."""
    host: int
    kf_ids: np.ndarray          # global keyframe indices owned (sorted)
    g_frame: np.ndarray         # [F_local] global frame numbers
    state: object               # pipeline.state.EncoderState (local)


def _partition_hosts(frames, config, n_hosts, fps, keyframes, owner):
    from ..pipeline.encoder import Encoder

    parts = []
    for h in range(n_hosts):
        kf_ids = np.flatnonzero(owner == h)
        if kf_ids.size == 0:
            parts.append(None)
            continue
        spans = keyframes[kf_ids]
        g_frame = np.concatenate(
            [np.arange(s, e + 1) for s, e in spans]).astype(np.int64)
        enc = Encoder(config)
        enc.load(frames[g_frame], fps=fps)
        # overwrite the locally re-detected keyframes with this host's
        # shard of the GLOBAL detection (local spans, concatenated order)
        sizes = spans[:, 1] - spans[:, 0] + 1
        ends = np.cumsum(sizes)
        local_kf = np.stack([ends - sizes, ends - 1], axis=1).astype(np.int32)
        st = enc.state
        st.keyframes = local_kf
        k = len(local_kf)
        st.palettes_rgb = np.zeros(
            (k, config.palette_count, config.tile_palette_size, 3), np.uint8)
        st.palette_centroids = np.zeros(
            (k, config.palette_count, 192), np.float32)
        parts.append(HostPartition(h, kf_ids, g_frame, st))
    return parts


def _to_global_tiles(part: HostPartition, cells: int) -> None:
    """Convert tilemap tile references from local to global indexing."""
    st = part.state

    def conv(tm):
        f = tm // cells
        return (part.g_frame[f] * cells + tm % cells).astype(np.int32)

    st.tm_tile = conv(st.tm_tile)


def _scatter_global(parts, cells, n_global, local_attr, shape_tail, dtype):
    """Collective (a): assemble a frame-major GLOBAL tile array from each
    host's local tiles (allgather + reorder by global frame)."""
    out = np.zeros((n_global,) + shape_tail, dtype)
    for part in parts:
        if part is None:
            continue
        local = getattr(part.state, local_attr)
        for f_loc, g in enumerate(part.g_frame):
            out[g * cells:(g + 1) * cells] = \
                local[f_loc * cells:(f_loc + 1) * cells]
    return out


def encode_gop_sharded_exact(frames: np.ndarray, config, n_hosts: int = 2,
                             fps: float = 24.0, fast_lzma: bool = False,
                             kmodes_mesh=None) -> bytes:
    """N-host GOP-sharded encode, byte-identical to Encoder.run_all."""
    from ..bitstream.gtm import GTMWriter
    from ..pipeline.dither_step import run_dither
    from ..pipeline.frame_tiling import run_frame_tiling
    from ..pipeline.global_tiling import compute_global_tiling_fwd
    from ..pipeline.load import detect_keyframes
    from ..pipeline.reindex import compute_reindex
    from ..pipeline.smooth import run_smooth
    from ..pipeline.state import EncoderState
    from ..pipeline.unique import compute_unique_fwd
    from ..constants import MAX_TILEMAP_H, MAX_TILEMAP_W

    f_total, h_px, w_px, _ = frames.shape
    th = min(h_px // TILE_W, MAX_TILEMAP_H)
    tw = min(w_px // TILE_W, MAX_TILEMAP_W)
    cells = th * tw
    frames = np.ascontiguousarray(frames[:, :th * TILE_W, :tw * TILE_W])

    # ---- phase 0 (replicated): global keyframe detection + GOP ownership
    keyframes = detect_keyframes(frames, cells)
    owner = assign_gops_to_hosts(keyframes, n_hosts)
    parts = _partition_hosts(frames, config, n_hosts, fps, keyframes, owner)
    live = [p for p in parts if p is not None]

    # ---- phase 1 (host-local): dither every owned keyframe
    for part in live:
        run_dither(part.state)
        _to_global_tiles(part, cells)

    # ---- phase 2: candidate-tile allgather -> global MakeUnique
    n_global = f_total * cells
    g_tiles_pal = _scatter_global(parts, cells, n_global, 'tiles_pal',
                                  (TILE_W, TILE_W), np.uint8)
    g_dpi = _scatter_global(parts, cells, n_global, 'tile_dpi', (), np.int32)
    g_use = _scatter_global(parts, cells, n_global, 'tile_use', (), np.int64)
    g_active = np.ones(n_global, bool)

    fwd, g_use, g_active, losers = compute_unique_fwd(
        g_tiles_pal, g_active, g_use)
    g_tiles_pal[losers] = 0
    for part in live:
        part.state.tm_tile = fwd[part.state.tm_tile].astype(np.int32)

    # ---- phase 3: global tiling (KModes) on the gathered tileset
    raw = n_global
    budget = config.max_tiles if config.max_tiles > 0 else \
        round(config.qb_tiles * equal_quality_tile_count(raw))
    desired = min(budget, raw)
    fwd, g_use, g_active, _merges = compute_global_tiling_fwd(
        g_tiles_pal, g_active, g_use, g_dpi, config, desired,
        mesh=kmodes_mesh)
    for part in live:
        part.state.tm_tile = fwd[part.state.tm_tile].astype(np.int32)
    fwd, g_use, g_active, losers = compute_unique_fwd(
        g_tiles_pal, g_active, g_use)
    g_tiles_pal[losers] = 0
    for part in live:
        part.state.tm_tile = fwd[part.state.tm_tile].astype(np.int32)

    # collective (d): psum of per-host use counts, then identical reindex
    use = np.zeros(n_global, np.int64)
    for part in live:
        use += np.bincount(part.state.tm_tile.ravel(), minlength=n_global)
    order, idx_map = compute_reindex(use)
    g_tiles_pal = g_tiles_pal[order]       # collective (c): replicate
    g_dpi = g_dpi[order]
    n_reduced = len(order)
    for part in live:
        part.state.tm_tile = idx_map[part.state.tm_tile].astype(np.int32)

    # ---- phase 4 (host-local): FrameTiling against the replicated tileset
    for part in live:
        st = part.state
        st.tiles_rgb = None     # no longer needed; queries use frames_rgb
        st.tiles_pal = g_tiles_pal
        st.tile_active = np.ones(n_reduced, bool)
        st.tile_dpi = g_dpi
        st.tile_use = np.zeros(n_reduced, np.int64)
        st._dev_cache = {}
        run_frame_tiling(st)

    # ---- phase 5: second reindex (use psum again)
    use = np.zeros(n_reduced, np.int64)
    for part in live:
        use += np.bincount(part.state.tm_tile.ravel(), minlength=n_reduced)
    order, idx_map = compute_reindex(use)
    g_tiles_pal = g_tiles_pal[order]
    n_final = len(order)
    for part in live:
        st = part.state
        st.tm_tile = idx_map[st.tm_tile].astype(np.int32)
        st.tiles_pal = g_tiles_pal
        st.tile_active = np.ones(n_final, bool)

    # ---- phase 6 (host-local): temporal smoothing per keyframe
    for part in live:
        run_smooth(part.state)

    # ---- phase 7 (host 0): gather command-stream inputs, write ONE GTM
    writer = GTMWriter(
        width=tw * TILE_W, height=th * TILE_W, fps=fps,
        tiles_pal=g_tiles_pal, palette_size=config.tile_palette_size,
        frame_count=f_total, kf_count=len(keyframes), fast_lzma=fast_lzma)
    for k, (s, e) in enumerate(keyframes):
        part = parts[owner[k]]
        st = part.state
        k_loc = int(np.flatnonzero(part.kf_ids == k)[0])
        ls, le = st.keyframes[k_loc]
        kf_frames = []
        for fr in range(ls, le + 1):
            kf_frames.append(dict(
                tile_idx=st.stm_tile[fr].ravel(),
                pal_idx=st.stm_pal[fr].ravel(),
                hmir=st.stm_h[fr].ravel(),
                vmir=st.stm_v[fr].ravel(),
                smoothed=st.stm_smooth[fr].ravel()))
        writer.add_keyframe(k, int(s), int(e), st.palettes_rgb[k_loc],
                            kf_frames)
    return writer.tobytes()
