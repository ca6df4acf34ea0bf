"""Production frame-axis mesh execution for the encoder pipeline.

This wires the ('gop','frame') mesh (parallel.mesh.make_mesh) into the
REAL pipeline steps — the round-2 gap where sharded library ops existed
but `Encoder.run_all` stayed single-device. The axis being replaced is
the reference's per-frame thread fan-out (/root/reference/main.pas:972,
1095): frames/cells of a GOP spread across chips over ICI.

Design rules (all three matter for the byte-identity guarantee):
  * only embarrassingly-parallel stages shard — queries/rows split
    across devices, model state (candidate features, tile tensors,
    palettes) replicated. Per-row math is unchanged, so results are
    bit-identical to the single-device encode (asserted by
    tests/test_parallel.py::test_mesh_encode_byte_identical).
  * cross-row couplings stay on one logical device: the dither plan
    dedup (a global sort), k-means centroid sums (f32 reduction order
    would change under psum — the sharded prepare runs the update
    replicated on the all-gathered features instead), and the GTM
    writer. They are a small fraction of the 1080p wall clock
    (BENCH_r02: ~1.1 s of 22 s).
  * each shard runs the SAME jitted program as the single-device path
    (shard_map, not GSPMD auto-partitioning), so per-device behavior is
    predictable and the Pallas kernels can slot in per-chip later.

Sharded here:
  stage 3 assign  (frame_tiling: PsyV features + streaming 1-NN; the
                   dominant kernel — ONE dispatch per keyframe, Pallas
                   kernel per shard on TPU)
  stage 2 feats   (frame_tiling candidate features)
  stage 1 mark    (frame_tiling 8-NN marking)
  dither prepare  (PsyV features + k-means assignment sharded; centroid
                   update replicated for bit-exact f32 sums)
  Knoll dither    (plan counts + rank selection halves)
  smooth          (cell axis: fused features + frame-chain scan)
  KModes solves   (global_tiling via sharded_ops.sharded_kmodes when
                   config.mesh_kmodes, bit-identical at 1/2/8 devices)
  MakeUnique      (round 5: hash-partitioned exact dedup, one
                   all_to_all + per-shard radix dedup —
                   sharded_ops.sharded_unique; canonical winners keep
                   streams byte-identical)
  GT signatures   (round 5: row-parallel signature build,
                   signatures_sharded below)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import features


def mesh_ok(mesh) -> bool:
    """Usable production mesh: >1 device, power-of-two size (row padding
    is pow2-bucketed, so any pow2 device count divides every batch).

    TILER_FORCE_MESH=1 admits a 1-device mesh: the sharded programs
    (shard_map + the Pallas kernel inside it) then compile and EXECUTE
    on whatever single chip is present — the only way to exercise the
    compiled Mosaic-under-shard_map path on real TPU hardware when just
    one chip is reachable (round-4 verdict item #4)."""
    if mesh is None or not isinstance(mesh, Mesh):
        return False
    n = mesh.devices.size
    if n == 1:
        import os
        return os.environ.get('TILER_FORCE_MESH') == '1'
    return (n & (n - 1)) == 0


def replicate(mesh: Mesh, arr):
    """Place an array fully replicated on every mesh device (no-op when
    it already carries that sharding — callers replicate hot tensors
    once per encode and pass them down)."""
    ndim = arr.ndim if hasattr(arr, 'ndim') else np.asarray(arr).ndim
    sh = NamedSharding(mesh, P(*(None,) * ndim))
    if getattr(arr, 'sharding', None) == sh:
        return arr
    return jax.device_put(arr, sh)


def shard_rows(mesh: Mesh, arr):
    """Shard the leading axis across every device of the mesh."""
    ndim = arr.ndim if hasattr(arr, 'ndim') else np.asarray(arr).ndim
    spec = P(mesh.axis_names, *(None,) * (ndim - 1))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _evict_other_meshes(cache: dict, mesh: Mesh) -> None:
    """Single-mesh cache policy: encodes use one mesh at a time, so when
    a new mesh shows up the compiled programs (and any replicated device
    buffers) of previous meshes are dead weight — drop them instead of
    holding them for the process lifetime."""
    stale = [k for k in cache
             if (k[0] if isinstance(k, tuple) else k) is not mesh]
    for k in stale:
        del cache[k]


# -- stage 3: fused query features + streaming 1-NN -----------------------

_assign_cache: dict = {}


def _get_assign_full_fn(mesh: Mesh, gamma_value, use_wavelets: bool,
                        qchunk: int, pallas: bool, interpret: bool,
                        bq: int, bc: int):
    key = (mesh, gamma_value, use_wavelets, qchunk, pallas, interpret,
           bq, bc)
    fn = _assign_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_assign_cache, mesh)
    ax = mesh.axis_names

    if pallas:
        def local(rows_loc, src_rep, cands_flat):
            # chunked like the single-device path: Mosaic stack-allocates
            # the kernel's full output pair in scoped VMEM, so each
            # pallas_call's query count stays bounded
            from ..ops.pallas_kernels import _nn_call
            rows2d = rows_loc.reshape(-1, qchunk)

            def body(carry, r):
                q = features.psyv_features_rgb(
                    src_rep[r], gamma_value=gamma_value,
                    use_wavelets=use_wavelets)
                err, idx = _nn_call(q, cands_flat, bq, bc, interpret)
                return carry, (idx, err)

            _, (idx, err) = jax.lax.scan(body, None, rows2d)
            return idx.reshape(-1), err.reshape(-1)

        in_specs = (P(ax), P(None, None, None, None), P(None, None))
    else:
        def local(rows_loc, src_rep, cands3d):
            from ..ops.knn import _scan_argmin
            rows2d = rows_loc.reshape(-1, qchunk)

            def body(carry, r):
                q = features.psyv_features_rgb(
                    src_rep[r], gamma_value=gamma_value,
                    use_wavelets=use_wavelets)
                idx, err = _scan_argmin(q, cands3d)
                return carry, (idx, err)

            _, (idx, err) = jax.lax.scan(body, None, rows2d)
            return idx.reshape(-1), err.reshape(-1)

        in_specs = (P(ax), P(None, None, None, None), P(None, None, None))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ax), P(ax)), check_vma=False))
    _assign_cache[key] = fn
    return fn


def assign_sharded_full(mesh: Mesh, rows: np.ndarray, src_rep, cands_rep,
                        gamma_value, use_wavelets: bool,
                        pallas: bool = False, interpret: bool = False):
    """Stage-3 assign for a WHOLE keyframe in ONE dispatch, the query
    rows sharded across the mesh.

    rows: [QP] int32 (QP a pow2 multiple of the device count) indices
    into the replicated source-tile tensor; cands_rep: the replicated
    candidate features — flat [C,192] for the Pallas kernel, chunked
    [n_chunks, BC, 192] for the XLA scan. Returns (idx [QP] i32,
    err [QP] f32) — per-row identical to the single-device path (the
    Pallas kernel and the scan share the lowest-index-wins tie rule)."""
    n_dev = mesh.devices.size
    qp_loc = len(rows) // n_dev
    qchunk = min(65536 if pallas else 16384, qp_loc)
    # pallas blocks 1024x2048: fits the 16 MB scoped-VMEM limit inside
    # the scan body (see frame_tiling's single-device call site)
    fn = _get_assign_full_fn(
        mesh, gamma_value, use_wavelets, qchunk=qchunk,
        pallas=pallas, interpret=interpret, bq=min(1024, qchunk),
        bc=2048)
    rows_d = jax.device_put(rows, NamedSharding(mesh, P(mesh.axis_names)))
    return fn(rows_d, src_rep, cands_rep)


# -- stage 2: candidate-combo PsyV features -------------------------------

_feats_cache: dict = {}


def _get_chunk_feats_fn(mesh: Mesh, gamma_value, use_wavelets: bool):
    key = (mesh, gamma_value, use_wavelets)
    fn = _feats_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_feats_cache, mesh)
    ax = mesh.axis_names

    def local(tp_all, pal_all, packed):
        from ..pipeline.frame_tiling import _chunk_feats
        return _chunk_feats(tp_all, pal_all, packed, 0, gamma_value,
                            use_wavelets)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(None, None, None),
                  P(None, ax)),
        out_specs=P(ax), check_vma=False))
    _feats_cache[key] = fn
    return fn


def chunk_feats_sharded(mesh: Mesh, tp_rep, pal_rep, packed,
                        gamma_value, use_wavelets: bool):
    """frame_tiling._chunk_feats with the packed combo index matrix
    sharded across the mesh (axis 1); tile tensor + palettes replicated.
    Returns the [QP,192] features as a mesh-sharded array."""
    fn = _get_chunk_feats_fn(mesh, gamma_value, use_wavelets)
    sh = NamedSharding(mesh, P(None, mesh.axis_names))
    return fn(tp_rep, pal_rep, jax.device_put(packed, sh))


# -- Knoll dither: plan counts + per-pixel rank selection -----------------
# The global color dedup (a device-wide sort) stays on one device; the
# row-parallel halves — plan counts per unique color and the per-tile
# Bayer rank selection, where the dither FLOPs are — shard across the
# mesh with the plan table replicated. Same per-row programs as
# ops.dither, so the dithered bytes are identical.

_knoll_cache: dict = {}


def _get_knoll_fns(mesh: Mesh):
    fns = _knoll_cache.get(mesh)
    if fns is not None:
        return fns
    _evict_other_meshes(_knoll_cache, mesh)
    ax = mesh.axis_names

    def counts_local(uniq_chunk, pals):
        from ..ops.dither import _counts_from_keys
        return _counts_from_keys(uniq_chunk, pals)

    def assign_local(counts_rep, inv2d, keys, pals):
        from ..ops.dither import _assign_counts
        return _assign_counts(counts_rep, inv2d.reshape(-1), keys, pals)

    counts_fn = jax.jit(jax.shard_map(
        counts_local, mesh=mesh,
        in_specs=(P(ax), P(None, None, None)),
        out_specs=P(ax, None), check_vma=False))
    assign_fn = jax.jit(jax.shard_map(
        assign_local, mesh=mesh,
        in_specs=(P(None, None), P(ax, None), P(ax, None),
                  P(None, None, None)),
        out_specs=P(ax, None), check_vma=False))
    fns = (counts_fn, assign_fn)
    _knoll_cache[mesh] = fns
    return fns


def knoll_counts_sharded(mesh: Mesh, uniq_chunk, pals_rep):
    """ops.dither._counts_from_keys with the unique colors sharded."""
    counts_fn, _ = _get_knoll_fns(mesh)
    return counts_fn(shard_rows(mesh, uniq_chunk), pals_rep)


def knoll_assign_sharded(mesh: Mesh, counts_rep, inv, keys, pals_rep):
    """ops.dither._assign_counts with the tile rows sharded; the plan
    table replicated. inv is [n,64] here (sharded by tile row, flattened
    per shard to match the single-device call)."""
    _, assign_fn = _get_knoll_fns(mesh)
    return assign_fn(counts_rep, shard_rows(mesh, inv),
                     shard_rows(mesh, keys), pals_rep)


# -- dither prepare: fused PsyV features + k-means, rows sharded ----------
# The feature pass shards exactly (rows independent). Inside k-means the
# ASSIGNMENT (the [N,D]@[D,k] distance matmul — half the per-iteration
# FLOPs) computes on each device's own rows; the CENTROID UPDATE runs
# replicated on the all-gathered feature array, because its f32 one-hot
# matmul sums are accumulation-order-sensitive — a psum of per-shard
# partial sums could drift low bits and flip a label, breaking the mesh
# byte-identity guarantee. Replicated update = the exact single-device
# matmul on the exact single-device input, so labels/centroids match the
# unsharded solver bit for bit (asserted by the mesh encode tests).

_kmeans_cache: dict = {}


def _get_kmeans_prepare_fn(mesh: Mesh, n: int, k: int, gamma_value,
                           use_lab: bool, use_wavelets: bool,
                           max_iters: int = 100, seed: int = 0x42381337):
    key = (mesh, n, k, gamma_value, use_lab, use_wavelets, max_iters,
           seed)
    fn = _kmeans_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_kmeans_cache, mesh)
    ax = mesh.axis_names
    from ..ops.kmeans import _assign, _plus_plus_init, _update

    def local(tp_all, idx_loc):
        feats_loc = features.psyv_features_rgb(
            tp_all[idx_loc], gamma_value=gamma_value, use_lab=use_lab,
            use_wavelets=use_wavelets).astype(jnp.float32)
        x2_loc = jnp.sum(feats_loc * feats_loc, axis=1)
        feats = jax.lax.all_gather(feats_loc, ax, tiled=True)
        x = feats[:n]
        cents = _plus_plus_init(x, k, jax.random.PRNGKey(seed))

        def assign_all(cents):
            lab_loc, _ = _assign(feats_loc, x2_loc, cents)
            return jax.lax.all_gather(lab_loc, ax, tiled=True)[:n]

        labels = assign_all(cents)

        def cond(carry):
            _, _, changed, it = carry
            return jnp.logical_and(changed, it < max_iters)

        def body(carry):
            cents, labels, _, it = carry
            cents, _ = _update(x, labels, k, cents)
            new_labels = assign_all(cents)
            return (cents, new_labels, jnp.any(new_labels != labels),
                    it + 1)

        cents, labels, _, _ = jax.lax.while_loop(
            cond, body, (cents, labels, jnp.bool_(True), jnp.int32(0)))
        cents, _ = _update(x, labels, k, cents)
        # u8 labels: k <= 256, and the download is bandwidth-bound
        return labels.astype(jnp.uint8), cents

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, None), P(ax)),
        out_specs=(P(None), P(None, None)), check_vma=False))
    _kmeans_cache[key] = fn
    return fn


def kmeans_prepare_sharded(mesh: Mesh, tiles_rep, idx_padded: np.ndarray,
                           n: int, k: int, gamma_value, use_lab: bool,
                           use_wavelets: bool):
    """Dither-prepare for one keyframe in ONE dispatch, feature rows
    sharded across the mesh: PsyV(LAB) features of the referenced tiles
    + Lloyd's k-means into k palette groups. idx_padded: [n_pad] int32
    (n_pad a pow2 multiple of the device count) cell-tile indices into
    the replicated source-tile tensor; rows past n are padding. Returns
    (labels [n] i32, centroids [k,D] f32) — bit-identical to
    ops.kmeans.kmeans on the same rows."""
    fn = _get_kmeans_prepare_fn(mesh, n, k, gamma_value, use_lab,
                                use_wavelets)
    idx_d = jax.device_put(idx_padded,
                           NamedSharding(mesh, P(mesh.axis_names)))
    return fn(tiles_rep, idx_d)


# -- smooth: fused cell features + frame-chain scan, cells sharded --------
# The frame chain is sequential, but every CELL's chain is independent —
# the reference's per-row thread fan-out (main.pas:1366) becomes the cell
# axis sharded across the mesh, with the reduced tileset + the keyframe's
# palettes replicated. Same per-cell program as pipeline.smooth, so the
# smoothed tilemap (and the stream) is byte-identical.

_smooth_cache: dict = {}


def _get_smooth_fn(mesh: Mesh, strength: float):
    key = (mesh, strength)
    fn = _smooth_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_smooth_cache, mesh)
    ax = mesh.axis_names

    def local(tp_all, pals, tile, pal, hm, vm):
        from ..pipeline.smooth import (_cell_features, _pack_stm,
                                       _smooth_chain)
        f, c_loc = tile.shape
        feats = _cell_features(
            tp_all, pals, tile.reshape(-1), pal.reshape(-1),
            hm.reshape(-1), vm.reshape(-1)).reshape(f, c_loc, -1)
        return _pack_stm(_smooth_chain(feats, tile, pal, hm, vm,
                                       strength))

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(None, None, None),
                  P(None, ax), P(None, ax), P(None, ax), P(None, ax)),
        out_specs=(P(None, ax),) * 3, check_vma=False))
    _smooth_cache[key] = fn
    return fn


def smooth_sharded(mesh: Mesh, tp_rep, palettes_k: np.ndarray,
                   tile: np.ndarray, pal: np.ndarray, hm: np.ndarray,
                   vm: np.ndarray, strength: float):
    """One keyframe's fused smooth with the CELL axis sharded.

    tile/pal/hm/vm: [F, C] host arrays; the cell axis pads up to a
    device-count multiple (padded cells compute independently and the
    caller slices them off). Returns the packed stm tuple (tile i32,
    pal u8, flags u8), each [F, C_pad] device-sharded."""
    n_dev = mesh.devices.size
    f, c = tile.shape
    cp = -(-c // n_dev) * n_dev

    def pad(a):
        if cp == c:
            return a
        return np.concatenate(
            [a, np.zeros((f, cp - c), a.dtype)], axis=1)

    sh = NamedSharding(mesh, P(None, mesh.axis_names))
    fn = _get_smooth_fn(mesh, strength)
    pals_rep = jax.device_put(palettes_k,
                              NamedSharding(mesh, P(None, None, None)))
    return fn(tp_rep, pals_rep,
              jax.device_put(pad(tile), sh), jax.device_put(pad(pal), sh),
              jax.device_put(pad(hm), sh), jax.device_put(pad(vm), sh))


# -- stage 1: 8-NN marking ------------------------------------------------

_topk_cache: dict = {}


def _get_topk_fn(mesh: Mesh, k: int):
    key = (mesh, k)
    fn = _topk_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_topk_cache, mesh)
    ax = mesh.axis_names

    def local(q_loc, cands3d):
        from ..ops.knn import _scan_topk
        return _scan_topk(q_loc, cands3d, k)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax, None), P(None, None, None)),
        out_specs=(P(ax, None), P(ax, None)), check_vma=False))
    _topk_cache[key] = fn
    return fn


_cands_rep_cache: dict = {}


def nearest_k_sharded(mesh: Mesh, queries: np.ndarray, candidates,
                      k: int, q_chunk: int = 8192, c_chunk: int = 8192):
    """ops.knn.nearest_k with each query chunk sharded across the mesh;
    candidates replicated. Bit-identical per query to the single-device
    scan (same _scan_topk program on a smaller batch)."""
    from ..ops.knn import _device_chunks, _pad_pow2, _pad_rows
    q_all = np.asarray(queries, np.float32)
    n_q = len(q_all)
    # one-entry cache: FrameTiling marks every keyframe against the SAME
    # global dataset — rebuilding + re-broadcasting it per keyframe would
    # repeat the ICI all-gather (id() key is safe here: the cache also
    # holds a reference, so the id cannot be recycled while cached)
    ckey = (mesh, id(candidates), c_chunk)
    if _cands_rep_cache.get('key') != ckey:
        _cands_rep_cache.clear()
        _cands_rep_cache['key'] = ckey
        _cands_rep_cache['src'] = candidates
        _cands_rep_cache['rep'] = replicate(
            mesh, _device_chunks(candidates, c_chunk))
    cands = _cands_rep_cache['rep']
    fn = _get_topk_fn(mesh, k)
    sh = NamedSharding(mesh, P(mesh.axis_names, None))
    # queue all chunks, download once (ops.knn._download_parts semantics)
    from ..ops.knn import _download_parts
    parts = []
    for qs in range(0, n_q, q_chunk):
        qe = min(n_q, qs + q_chunk)
        qp = _pad_pow2(qe - qs)
        q = jax.device_put(_pad_rows(q_all[qs:qe], qp), sh)
        idx, err = fn(q, cands)
        parts.append((idx[:qe - qs], err[:qe - qs]))
    return _download_parts(parts, empty_shape=(0, k))


# -- GlobalTiling signature build (row-parallel) --------------------------

_sigs_cache: dict = {}


def signatures_sharded(mesh: Mesh, tiles_pal_dev, act_p: np.ndarray,
                       palette_size: int):
    """global_tiling's per-tile [80]-byte KModes signature build with the
    active-row axis sharded across the mesh (the tiles tensor is
    replicated). Pure integer math — per-row values are identical to the
    single-device kernel, so everything downstream (and the stream) is
    unchanged. Returns (sigs [A,80] u8 sharded, sums [A] i32 host-bound
    device array), matching _signatures_device_jit's contract."""
    key = (mesh, palette_size)
    fn = _sigs_cache.get(key)
    if fn is None:
        _evict_other_meshes(_sigs_cache, mesh)

        def local(tiles_rep, act_loc):
            from ..constants import KMODES_ZONE_COUNT
            flat = tiles_rep[act_loc].reshape(act_loc.shape[0], 64) \
                .astype(jnp.int32)
            zone_of = flat * KMODES_ZONE_COUNT // palette_size
            acc = jnp.sum(
                (zone_of[:, :, None] ==
                 jnp.arange(KMODES_ZONE_COUNT)[None, None, :]
                 ).astype(jnp.int32), axis=1)
            thres = palette_size // KMODES_ZONE_COUNT
            zones = (acc > thres).astype(jnp.uint8)
            sigs = jnp.concatenate(
                [flat.astype(jnp.uint8), zones], axis=1)
            return sigs, jnp.sum(sigs.astype(jnp.int32), axis=1)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(mesh.axis_names)),
            out_specs=(P(mesh.axis_names), P(mesh.axis_names))))
        _sigs_cache[key] = fn

    act_d = jax.device_put(
        act_p, NamedSharding(mesh, P(mesh.axis_names)))
    tiles_rep = replicate(mesh, tiles_pal_dev)
    return fn(tiles_rep, act_d)
