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
    would change under psum), and the GTM writer. They are a small
    fraction of the 1080p wall clock (BENCH_r02: ~1.1 s of 22 s).
  * each shard runs the SAME jitted program as the single-device path
    (shard_map, not GSPMD auto-partitioning), so per-device behavior is
    predictable and the Pallas kernels can slot in per-chip later.

Sharded here:
  stage 3 assign  (frame_tiling: PsyV features + streaming 1-NN; the
                   dominant kernel, 4.8 s of 16.5 s at 1080p)
  stage 2 feats   (frame_tiling candidate features)
  stage 1 mark    (frame_tiling 8-NN marking)
  KModes solves   (global_tiling via sharded_ops.sharded_kmodes,
                   bit-identical by test at 1/2/8 devices)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import features


def mesh_ok(mesh) -> bool:
    """Usable production mesh: >1 device, power-of-two size (row padding
    is pow2-bucketed, so any pow2 device count divides every batch)."""
    if mesh is None or not isinstance(mesh, Mesh):
        return False
    n = mesh.devices.size
    return n > 1 and (n & (n - 1)) == 0


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


def _get_assign_fn(mesh: Mesh, gamma_value, use_wavelets: bool):
    key = (mesh, gamma_value, use_wavelets)
    fn = _assign_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_assign_cache, mesh)
    ax = mesh.axis_names

    def local(rows_loc, src_rep, cands3d):
        from ..ops.knn import _scan_argmin
        q = features.psyv_features_rgb(
            src_rep[rows_loc], gamma_value=gamma_value,
            use_wavelets=use_wavelets)
        return _scan_argmin(q, cands3d)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax), P(None, None, None, None), P(None, None, None)),
        out_specs=(P(ax), P(ax)), check_vma=False))
    _assign_cache[key] = fn
    return fn


def assign_sharded(mesh: Mesh, rows: np.ndarray, src_rep, cands3d_rep,
                   gamma_value, use_wavelets: bool):
    """Stage-3 assign with the query rows sharded across the mesh.

    rows: [QP] int32 (QP a pow2 multiple of the device count) indices
    into the replicated source-tile tensor; returns (idx [QP] i32,
    err [QP] f32) — bit-identical per row to the single-device
    frame_tiling scan path."""
    fn = _get_assign_fn(mesh, gamma_value, use_wavelets)
    rows_d = jax.device_put(rows, NamedSharding(mesh, P(mesh.axis_names)))
    return fn(rows_d, src_rep, cands3d_rep)


# -- stage 2: candidate-combo PsyV features -------------------------------

_feats_cache: dict = {}


def _get_chunk_feats_fn(mesh: Mesh, gamma_value, use_wavelets: bool):
    key = (mesh, gamma_value, use_wavelets)
    fn = _feats_cache.get(key)
    if fn is not None:
        return fn
    _evict_other_meshes(_feats_cache, mesh)
    ax = mesh.axis_names

    def local(tp_all, pal_all, tidx, pidx, hm, vm):
        tp = tp_all[tidx]
        pals = pal_all[pidx]
        t = features.mirror_tiles(tp, hm, vm)
        cpn = features.pal_tiles_to_cpn(t, pals, gamma_value, False)
        return features.psyv_from_cpn(cpn, use_wavelets=use_wavelets)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(None, None, None),
                  P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax), check_vma=False))
    _feats_cache[key] = fn
    return fn


def chunk_feats_sharded(mesh: Mesh, tp_rep, pal_rep, tidx, pidx, hm, vm,
                        gamma_value, use_wavelets: bool):
    """frame_tiling._chunk_feats with the combo index vectors sharded
    across the mesh; tile tensor + palettes replicated. Returns the
    [QP,192] features as a mesh-sharded array."""
    fn = _get_chunk_feats_fn(mesh, gamma_value, use_wavelets)
    sh = NamedSharding(mesh, P(mesh.axis_names))
    put = lambda a: jax.device_put(a, sh)  # noqa: E731
    return fn(tp_rep, pal_rep, put(tidx), put(pidx), put(hm), put(vm))


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
    out_idx = np.empty((n_q, k), np.int32)
    out_err = np.empty((n_q, k), np.float32)
    for qs in range(0, n_q, q_chunk):
        qe = min(n_q, qs + q_chunk)
        qp = _pad_pow2(qe - qs)
        q = jax.device_put(_pad_rows(q_all[qs:qe], qp), sh)
        idx, err = fn(q, cands)
        out_idx[qs:qe] = np.asarray(idx)[:qe - qs]
        out_err[qs:qe] = np.asarray(err)[:qe - qs]
    return out_idx, out_err
