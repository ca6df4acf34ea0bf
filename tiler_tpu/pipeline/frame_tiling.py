"""FrameTiling step: remap every tilemap cell to the best (tile, palette,
mirror) candidate from the reduced tileset.

Reference: PrepareGlobalFT (/root/reference/main.pas:3736-3780) builds a
64-dim kd-tree over active tiles x 4 mirror variants; PrepareFrameTiling
(main.pas:3791-3967) marks candidate combos per keyframe via 8-NN bucket
search expanded across palettes by quality level (UseOne main.pas:
3802-3853, palette-centroid distances BuildPaletteCorrTriangle main.pas:
3855-3867), then computes 192-dim PsyV features of every used combo
(DoPsyV main.pas:3883-3919) and 1-NN-searches each cell's source-tile
feature against them (DoFrameTiling main.pas:3992-4047).

TPU-native: both searches are exact streaming distance matmuls (ops.knn);
the per-keyframe lazy init/teardown critical sections and FramesLeft
refcounts disappear — each keyframe is a bulk three-phase pass. Dataset
entry order matches the reference's mirror walk (attrs 0,1,3,2 per tile)
for tie-compatibility.
"""
from __future__ import annotations

import numpy as np

from ..config import FTQuality
from ..constants import TILE_W
from ..ops import features, knn
from .state import EncoderState

_ATTR_ORDER = np.array([0, 1, 3, 2], np.int32)  # h|v<<1 per dataset slot


def _ft_gamma(cfg):
    return cfg.encoder_gamma if cfg.ft_gamma else None


def _expand_mirrors(t_u8):
    """[A,8,8] u8 -> [4A,64] f32 mirror variants, on device. MODULE-LEVEL
    jit: a jit defined inside the calling function gets a fresh cache per
    call and recompiles every encode — 7s per compile through the
    tunneled TPU."""
    import jax.numpy as jnp
    variants = jnp.stack([
        t_u8,                    # attrs 0: no mirror
        t_u8[:, :, ::-1],        # attrs 1: H
        t_u8[:, ::-1, ::-1],     # attrs 3: HV
        t_u8[:, ::-1, :],        # attrs 2: V
    ], axis=1)  # [A,4,8,8]
    return variants.reshape(-1, TILE_W * TILE_W).astype(jnp.float32)


def build_global_dataset(state: EncoderState):
    """[4A, 64] float32 mirrored PalPixels (device-resident; the u8 tiles
    upload once and the 4 mirror variants are built on device) + maps to
    (tile, attrs)."""
    import jax
    import jax.numpy as jnp
    global _expand_jit
    if _expand_jit is None:
        _expand_jit = jax.jit(_expand_mirrors)
    act = np.flatnonzero(state.tile_active)
    ds = _expand_jit(state.device_tiles_pal()[jnp.asarray(
        act.astype(np.int32))])
    tile_of = np.repeat(act, 4)
    attrs_of = np.tile(_ATTR_ORDER, len(act))
    return ds, tile_of, attrs_of


_expand_jit = None


def mark_candidates(state: EncoderState, k: int, ds, tile_of, attrs_of,
                    pal_mask: np.ndarray | None):
    """Stage 1: bool[P, 4A] used-combo indicator for keyframe k."""
    cfg = state.config
    s, e = state.keyframes[k]
    cell_tiles = state.tm_tile[s:e + 1].ravel()
    cell_pals = state.tm_pal[s:e + 1].ravel()

    uq_tiles, tile_inv = np.unique(cell_tiles, return_inverse=True)
    queries = state.tiles_pal[uq_tiles].reshape(len(uq_tiles), -1) \
        .astype(np.float32)
    from ..parallel.mesh_pipeline import mesh_ok, nearest_k_sharded
    if mesh_ok(state.mesh):
        idxs, errs = nearest_k_sharded(state.mesh, queries, ds, k=8)
    else:
        idxs, errs = knn.nearest_k(queries, ds, k=8)
    # skip consecutive equal-error results (UseOne, main.pas:3832-3837)
    keep = np.ones_like(errs, bool)
    keep[:, 1:] = errs[:, 1:] != errs[:, :-1]

    # unique (pal, tile) pairs drive the marking; the whole per-palette
    # loop is pure set logic, so it vectorizes exactly: scatter the kept
    # k-NN hits into a per-palette indicator, then expand across palettes
    # (SLOW: any palette; MEDIUM: the pal_mask boolean matmul)
    pair_ids = cell_pals.astype(np.int64) * len(uq_tiles) + tile_inv
    uq_pairs = np.unique(pair_ids)
    pair_pal = (uq_pairs // len(uq_tiles)).astype(np.int64)
    pair_tile_row = (uq_pairs % len(uq_tiles)).astype(np.int64)

    marked_q = np.zeros((cfg.palette_count, len(ds)), bool)
    km = keep[pair_tile_row]                         # [n_pairs, 8]
    marked_q[np.repeat(pair_pal, km.sum(1)),
             idxs[pair_tile_row][km]] = True
    if cfg.ft_quality == FTQuality.FAST:
        used = marked_q
    elif cfg.ft_quality == FTQuality.SLOW:
        used = np.broadcast_to(marked_q.any(0),
                               marked_q.shape).copy()
    else:  # MEDIUM: used[j] = any marking palette q with centroid near j
        used = (pal_mask.astype(np.float32)
                @ marked_q.astype(np.float32)) > 0
    return used


def palette_similarity_mask(state: EncoderState, k: int) -> np.ndarray:
    """[P,P] bool: pal_mask[j,q] = centroid j close enough to q
    (BuildPaletteCorrTriangle + APalTol test, main.pas:3843-3847)."""
    cfg = state.config
    c = state.palette_centroids[k].astype(np.float64)
    d = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    finite = np.nan_to_num(d, nan=0.0, posinf=0.0)
    highest = finite.max() if finite.size else 0.0
    return d < cfg.ft_palette_tol * highest


def candidate_features(state: EncoderState, k: int, used, tile_of, attrs_of,
                       chunk: int = 262144, tiles_pal_dev=None):
    """Stage 2: PsyV features of every used (pal, tile, mirror) combo.

    The tile-pixel and palette gathers happen on device (tiles_pal and the
    keyframe's palettes upload once; per-chunk traffic is only the int32
    index vectors) — the host-side fancy indexing here was a hotspot on
    slow hosts.

    Mirror dedup (wavelet basis): a mirrored tile's features are an EXACT
    signed column permutation of the unmirrored ones
    (features.mirror_coeff_perms), so the expensive palette-LUT +
    colorspace + basis matmul runs once per (pal, tile) and the mirror
    variants expand with static permutations, then un-sort back to the
    (pal, dentry) candidate order so exact-distance ties resolve
    identically to the direct path."""
    import functools
    import jax
    import jax.numpy as jnp
    cfg = state.config
    pal_idx, dentry = np.nonzero(used)
    c = len(pal_idx)
    tiles = tile_of[dentry]
    attrs = attrs_of[dentry]

    from ..parallel.mesh_pipeline import (chunk_feats_sharded, mesh_ok,
                                          replicate)
    par = mesh_ok(state.mesh)
    tiles_pal_d = state.device_tiles_pal() if tiles_pal_dev is None \
        else tiles_pal_dev  # uploaded once per encode by run_frame_tiling
    pals_d = jnp.asarray(state.palettes_rgb[k])
    if par:
        tiles_pal_d = replicate(state.mesh, tiles_pal_d)
        pals_d = replicate(state.mesh, pals_d)
    global _chunk_feats_jit
    if _chunk_feats_jit is None:
        _chunk_feats_jit = functools.partial(
            jax.jit, static_argnames=('gamma_value', 'use_wavelets'))(
                _chunk_feats)
    chunk_feats = _chunk_feats_jit

    def base_feats(b_tiles, b_pals, b_hm, b_vm):
        # candidate features stay ON DEVICE: only int32 index vectors go
        # up, nothing comes down (the 1-NN scan consumes them in place).
        # Mesh path: combo rows shard across devices, same per-row math.
        n = len(b_tiles)
        parts = []
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            n_pad = features.pad_pow2(hi - lo)

            def pad(a, fill=0):
                out = np.full(n_pad, fill, a.dtype)
                out[:hi - lo] = a[lo:hi]
                return out
            if par:
                res = chunk_feats_sharded(
                    state.mesh, tiles_pal_d, pals_d,
                    pad(b_tiles.astype(np.int32)),
                    pad(b_pals.astype(np.int32)),
                    pad(b_hm), pad(b_vm),
                    _ft_gamma(cfg), cfg.use_wavelets)
            else:
                res = chunk_feats(
                    tiles_pal_d, pals_d,
                    jnp.asarray(pad(b_tiles.astype(np.int32))),
                    jnp.asarray(pad(b_pals.astype(np.int32))),
                    jnp.asarray(pad(b_hm)), jnp.asarray(pad(b_vm)),
                    _ft_gamma(cfg), cfg.use_wavelets)
            parts.append(res[:hi - lo])
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    pp = features.mirror_coeff_perms(cfg.use_wavelets)
    pair_ids = pal_idx.astype(np.int64) * int(state.n_tiles) + tiles
    uq, inv = np.unique(pair_ids, return_inverse=True)
    state.metrics.setdefault('ft_pair_dedup', []).append(
        round(c / max(len(uq), 1), 3))
    if pp is not None and len(uq) <= 0.9 * c:
        perm4, sign4 = pp
        base = base_feats((uq % state.n_tiles).astype(np.int32),
                          (uq // state.n_tiles).astype(np.int32),
                          np.zeros(len(uq), bool), np.zeros(len(uq), bool))
        if par:
            # the mirror expansion gathers arbitrary base rows; replicate
            # once (all-gather) instead of per-gather collectives
            base = replicate(state.mesh, base)
        # bucket the base length too: _mirror_expand_one specializes on
        # (base, seg) shapes and an exact len(uq) would recompile per
        # keyframe
        b_pad = features.pad_pow2(len(uq))
        if b_pad != base.shape[0]:
            base = jnp.pad(base, ((0, b_pad - base.shape[0]), (0, 0)))
        order = np.argsort(attrs, kind='stable')
        ginv = inv[order]
        global _mirror_expand_jit
        if _mirror_expand_jit is None:
            _mirror_expand_jit = jax.jit(
                _mirror_expand_one, static_argnames=('attr',))
        perm_d, sign_d = jnp.asarray(perm4), jnp.asarray(sign4)
        bounds = np.searchsorted(attrs[order], np.arange(5))
        parts = []
        for a in range(4):
            lo, hi = int(bounds[a]), int(bounds[a + 1])
            if hi == lo:
                continue
            n_pad = features.pad_pow2(hi - lo)  # bucketed: few compiles
            seg = np.zeros(n_pad, np.int32)
            seg[:hi - lo] = ginv[lo:hi]
            parts.append(_mirror_expand_jit(base, jnp.asarray(seg),
                                            perm_d, sign_d, a)[:hi - lo])
        feats = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        # restore the original (pal, dentry) candidate order: stage-3
        # argmin breaks exact-distance ties by candidate index, and the
        # direct path (and the reference's mirror walk) resolve them in
        # this order — one device row gather keeps the two paths
        # tie-identical
        inv_order = np.empty_like(order)
        inv_order[order] = np.arange(len(order))
        feats = feats[jnp.asarray(inv_order.astype(np.int32))]
        return (feats, pal_idx.astype(np.int32),
                tiles.astype(np.int32), attrs)

    feats = base_feats(tiles, pal_idx, (attrs & 1).astype(bool),
                       (attrs & 2).astype(bool))
    return feats, pal_idx.astype(np.int32), tiles.astype(np.int32), attrs


def _mirror_expand_one(base, ginv, perm4, sign4, attr: int):
    """One mirror-attr group: row gather from the base (pal,tile)
    features + static column permutation + sign."""
    return base[ginv][:, perm4[attr]] * sign4[attr][None, :]


def _chunk_feats(tp_all, pal_all, tidx, pidx, hm, vm, gamma_value,
                 use_wavelets):
    """Candidate-combo PsyV features via device gathers (module-level so
    the jit cache persists across keyframes and encodes)."""
    tp = tp_all[tidx]
    pals = pal_all[pidx]
    t = features.mirror_tiles(tp, hm, vm)
    cpn = features.pal_tiles_to_cpn(t, pals, gamma_value, False)
    return features.psyv_from_cpn(cpn, use_wavelets=use_wavelets)


_chunk_feats_jit = None
_mirror_expand_jit = None


def _query_assign_factory():
    import functools
    import jax

    @functools.partial(jax.jit, static_argnames=('gamma_value',
                                                 'use_wavelets'))
    def step(src_tiles_u8, cands3d, gamma_value, use_wavelets):
        """Fused stage 3: source-tile PsyV features + streaming 1-NN over
        the device-resident candidate chunks. Only u8 tiles go up; only
        [Q] idx/err come down."""
        q = features.psyv_features_rgb(src_tiles_u8,
                                       gamma_value=gamma_value,
                                       use_wavelets=use_wavelets)
        from ..ops.knn import _scan_argmin
        return _scan_argmin(q, cands3d)

    return step


_query_assign = None


def _query_assign_pallas_factory():
    import functools
    import jax

    @functools.partial(jax.jit, static_argnames=('bq', 'bc', 'gamma_value',
                                                 'use_wavelets'))
    def step(src_tiles_u8, cand_feats, bq: int, bc: int, gamma_value,
             use_wavelets):
        """Pallas stage 3 in ONE dispatch: query features + fused
        streaming 1-NN (the two-dispatch form pays an extra tunnel round
        trip per query chunk)."""
        from ..ops.pallas_kernels import _nn_call
        q = features.psyv_features_rgb(src_tiles_u8,
                                       gamma_value=gamma_value,
                                       use_wavelets=use_wavelets)
        return _nn_call(q, cand_feats, bq, bc, False)

    return step


_query_assign_pallas = None


def _use_pallas_nn() -> bool:
    """Stage-3 1-NN path selection: the fused Pallas streaming kernel on
    real TPU (the [Q,C] distance matrix never touches HBM — 2.9x the XLA
    scan at 720p shapes, identical winner indices there; distances round
    differently so the residual METRIC can differ in low bits), the XLA
    scan elsewhere. TILER_NO_PALLAS=1 forces the scan path."""
    import os
    if os.environ.get('TILER_NO_PALLAS') == '1':
        return False
    import jax
    return jax.default_backend() == 'tpu'


def _changed_mask(frames_rgb: np.ndarray, th: int, tw: int) -> np.ndarray:
    """[F,H,W,3] u8 -> bool [F, th*tw]: cell differs from the same cell
    one frame earlier (frame 0 all-True). Queries whose source tile
    bytes equal the previous frame's are EXACT duplicates for stage 3
    (the candidate set is per-keyframe), so their 1-NN result forward-
    fills instead of recomputing — assign cost scales with motion.

    Host numpy on purpose: a device version would cost one XLA compile
    per distinct clip shape through the tunnel; this is a single
    memory-bound pass (~0.1 s at 1080p x 16)."""
    f = frames_rgb.shape[0]
    x = frames_rgb[:, :th * TILE_W, :tw * TILE_W] \
        .reshape(f, th, TILE_W, tw, TILE_W, 3)
    eq = (x[1:] == x[:-1]).all(axis=(2, 4, 5))       # [F-1, th, tw]
    out = np.ones((f, th * tw), bool)
    out[1:] = ~eq.reshape(f - 1, th * tw)
    return out


def run_frame_tiling(state: EncoderState) -> EncoderState:
    import jax
    import jax.numpy as jnp
    from ..parallel.mesh_pipeline import (assign_sharded, mesh_ok,
                                          replicate)
    par = mesh_ok(state.mesh)
    global _query_assign
    if _query_assign is None:
        _query_assign = _query_assign_factory()
    import time
    cfg = state.config
    phases = {'mark': 0.0, 'cand_feats': 0.0, 'assign': 0.0}
    t0 = time.perf_counter()
    ds, tile_of, attrs_of = build_global_dataset(state)
    jax.block_until_ready(ds)
    phases['dataset'] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    tiles_pal_dev = state.device_tiles_pal()
    if par:
        # one ICI broadcast per encode; candidate_features' replicate()
        # then no-ops on the already-replicated tensor every keyframe
        tiles_pal_dev = replicate(state.mesh, tiles_pal_dev)
    jax.block_until_ready(tiles_pal_dev)
    phases['upload'] = round(time.perf_counter() - t0, 3)
    ch_all = _changed_mask(state.frames_rgb, state.tilemap_h,
                           state.tilemap_w)
    residual = 0.0
    knn_sizes = []
    q_total = q_changed = 0
    src_rep = None

    for k in range(len(state.keyframes)):
        s, e = state.keyframes[k]
        t0 = time.perf_counter()
        pal_mask = palette_similarity_mask(state, k) \
            if cfg.ft_quality == FTQuality.MEDIUM else None
        used = mark_candidates(state, k, ds, tile_of, attrs_of, pal_mask)
        phases['mark'] += time.perf_counter() - t0
        t0 = time.perf_counter()
        feats, cand_pal, cand_tile, cand_attrs = candidate_features(
            state, k, used, tile_of, attrs_of, tiles_pal_dev=tiles_pal_dev)
        knn_sizes.append(len(feats))
        jax.block_until_ready(feats)
        phases['cand_feats'] += time.perf_counter() - t0
        t0 = time.perf_counter()

        # lay the candidates out for the 1-NN path (pad with far points)
        use_pallas = _use_pallas_nn() and not par
        c_chunk = 4096 if use_pallas else 8192
        n_c = feats.shape[0]
        n_chunks = max(1, -(-n_c // c_chunk))
        pad_rows = n_chunks * c_chunk - n_c
        if pad_rows:
            feats = jnp.concatenate(
                [feats, jnp.full((pad_rows, feats.shape[1]), 1e9,
                                 jnp.float32)])
        cands3d = None if use_pallas else feats.reshape(n_chunks, c_chunk,
                                                        -1)
        if par:
            cands3d = replicate(state.mesh, cands3d)

        # stage 3: fused per-chunk query features + 1-NN assignment. The
        # query tiles are device slices of the identity source-tile tensor
        # (one frames upload per encode) — no per-chunk H2D traffic.
        src_all = state.device_source_tiles()
        if par:
            if src_rep is None:  # one broadcast per encode
                src_rep = replicate(state.mesh, src_all)
            src_all = src_rep
        base = s * state.tilemap_size
        cells = state.tilemap_size
        f_kf = e - s + 1
        n_q = f_kf * cells
        # temporal query dedup: cells byte-identical to the previous
        # frame forward-fill their 1-NN result (exact; see _changed_mask).
        # The fill must not cross a keyframe boundary — candidate sets
        # and palettes change — so the first frame is all-changed.
        ch = ch_all[s:e + 1].copy()
        ch[0, :] = True
        import os
        if os.environ.get('TILER_NO_QDEDUP') == '1':
            ch[:] = True  # cross-check switch: recompute every cell
        changed = np.flatnonzero(ch.ravel())
        q_total += n_q
        q_changed += len(changed)
        dense = len(changed) > 0.98 * n_q  # skip gather overhead
        qchunk = 16384
        global _query_assign_pallas
        if _query_assign_pallas is None:
            _query_assign_pallas = _query_assign_pallas_factory()
        # queue EVERY chunk's dispatch, sync ONCE at the end: per-chunk
        # np.asarray blocks on the tunnel RTT and serialized the device
        # (2 syncs x 22 chunks was most of the assign phase at 720p)
        n_run = n_q if dense else len(changed)
        idx_parts, err_parts = [], []
        for lo in range(0, n_run, qchunk):
            hi = min(n_run, lo + qchunk)
            qp = features.pad_pow2(hi - lo)
            if par:
                # mesh path: query rows shard across every device; the
                # gather from the replicated source tensor happens inside
                # the shard_mapped program (parallel.mesh_pipeline)
                rows = np.full(qp, base + (lo if dense else changed[lo]),
                               np.int32)
                if dense:
                    rows[:hi - lo] = base + np.arange(lo, hi,
                                                      dtype=np.int32)
                else:
                    rows[:hi - lo] = base + changed[lo:hi]
                idx, err = assign_sharded(state.mesh, rows, src_all,
                                          cands3d, _ft_gamma(cfg),
                                          cfg.use_wavelets)
                idx_parts.append(idx[:hi - lo])
                err_parts.append(err[:hi - lo])
                continue
            if dense:
                buf = src_all[base + lo:base + hi]
                if qp != hi - lo:
                    buf = jnp.pad(buf, ((0, qp - (hi - lo)), (0, 0),
                                        (0, 0), (0, 0)))
            else:
                rows = np.full(qp, base + changed[lo], np.int32)
                rows[:hi - lo] = base + changed[lo:hi]
                buf = src_all[jnp.asarray(rows)]
            if use_pallas:
                err, idx = _query_assign_pallas(
                    buf, feats, min(2048, qp), c_chunk,
                    _ft_gamma(cfg), cfg.use_wavelets)
            else:
                idx, err = _query_assign(buf, cands3d,
                                         _ft_gamma(cfg), cfg.use_wavelets)
            idx_parts.append(idx[:hi - lo])
            err_parts.append(err[:hi - lo])
        run_idx = np.asarray(jnp.concatenate(idx_parts)
                             if len(idx_parts) > 1 else idx_parts[0])
        run_err = np.asarray(jnp.concatenate(err_parts)
                             if len(err_parts) > 1 else err_parts[0])
        if dense:
            best_idx, best_err = run_idx, run_err
        else:
            # forward fill: each cell takes the result computed at its
            # most recent changed frame (frame 0 is always changed)
            last = np.maximum.accumulate(
                np.where(ch, np.arange(f_kf)[:, None], -1), axis=0)
            changed_pos = np.cumsum(ch.ravel()) - 1
            src_flat = (last * cells
                        + np.arange(cells)[None, :]).ravel()
            fill = changed_pos[src_flat]
            best_idx = run_idx[fill]
            best_err = run_err[fill]
        shape = (e - s + 1, state.tilemap_h, state.tilemap_w)
        state.tm_tile[s:e + 1] = cand_tile[best_idx].reshape(shape)
        state.tm_pal[s:e + 1] = cand_pal[best_idx].reshape(shape)
        state.tm_h[s:e + 1] = (cand_attrs[best_idx] & 1).astype(bool) \
            .reshape(shape)
        state.tm_v[s:e + 1] = (cand_attrs[best_idx] & 2).astype(bool) \
            .reshape(shape)
        residual += float(best_err.sum())
        phases['assign'] += time.perf_counter() - t0

    state.metrics['ft_residual_err'] = residual
    state.metrics['ft_knn_sizes'] = knn_sizes
    state.metrics['ft_q_changed_frac'] = round(
        q_changed / max(q_total, 1), 4)
    state.metrics['ft_phases'] = {k: round(v, 3) for k, v in phases.items()}
    return state
