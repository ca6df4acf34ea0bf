"""Exact nearest-neighbor search as streaming distance matmuls — the
ANN kd-tree (Mount/Arya) replacement.

The reference builds kd-trees with bucket size 1 and eps=0 — i.e. EXACT
search (/root/reference/main.pas:3779,3961; C ABI extern.pas:63-67) — over
64-dim PalPixels and 192-dim PsyV points. On TPU, exact NN at these sizes
is a dense [Q,D]@[D,C] matmul on the MXU with a running argmin/top-k,
streamed over candidate chunks so the [Q,C] distance matrix never
materializes in HBM (cf. TPU-KNN, PAPERS.md). Distances are squared L2,
matching ANN's ANNdist convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pad_pow2(n: int, minimum: int = 1024) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


def _pad_q(q, n_pad):
    if q.shape[0] == n_pad:
        return q
    return np.concatenate(
        [q, np.zeros((n_pad - q.shape[0], q.shape[1]), q.dtype)])


@functools.partial(jax.jit, donate_argnums=(3, 4))
def _argmin_step(q, q2, cand_chunk, best_err, best_idx, base):
    """One candidate chunk: update running (best_err, best_idx)."""
    c2 = jnp.sum(cand_chunk * cand_chunk, axis=1)
    d = q2[:, None] + c2[None, :] - 2.0 * (q @ cand_chunk.T)
    idx = jnp.argmin(d, axis=1)
    err = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    take = err < best_err
    return (jnp.where(take, err, best_err),
            jnp.where(take, idx.astype(jnp.int32) + base, best_idx))


def nearest_1(queries: np.ndarray, candidates: np.ndarray,
              q_chunk: int = 8192, c_chunk: int = 16384):
    """Exact 1-NN: returns (idx [Q] int32, err [Q] f32 squared L2)."""
    q_all = np.asarray(queries, np.float32)
    c_all = np.asarray(candidates, np.float32)
    n_q, n_c = len(q_all), len(c_all)
    out_idx = np.empty(n_q, np.int32)
    out_err = np.empty(n_q, np.float32)
    for qs in range(0, n_q, q_chunk):
        qe = min(n_q, qs + q_chunk)
        qp = _pad_pow2(qe - qs)
        q = jnp.asarray(_pad_q(q_all[qs:qe], qp))
        q2 = jnp.sum(q * q, axis=1)
        best_err = jnp.full(qp, jnp.inf, jnp.float32)
        best_idx = jnp.zeros(qp, jnp.int32)
        for cs in range(0, n_c, c_chunk):
            ce = min(n_c, cs + c_chunk)
            chunk = c_all[cs:ce]
            if ce - cs < c_chunk:  # pad to keep one compiled shape
                pad = np.full((c_chunk - (ce - cs), chunk.shape[1]),
                              1e9, np.float32)
                chunk = np.concatenate([chunk, pad])
            best_err, best_idx = _argmin_step(
                q, q2, jnp.asarray(chunk), best_err, best_idx,
                jnp.int32(cs))
        out_idx[qs:qe] = np.asarray(best_idx)[:qe - qs]
        out_err[qs:qe] = np.asarray(best_err)[:qe - qs]
    return out_idx, out_err


@functools.partial(jax.jit, static_argnames=('k',))
def _topk_step(q, q2, cand_chunk, best_err, best_idx, base, k: int):
    c2 = jnp.sum(cand_chunk * cand_chunk, axis=1)
    d = q2[:, None] + c2[None, :] - 2.0 * (q @ cand_chunk.T)
    neg_err, idx = jax.lax.top_k(-d, k)  # smallest k distances
    err = -neg_err
    merged_err = jnp.concatenate([best_err, err], axis=1)
    merged_idx = jnp.concatenate([best_idx, idx.astype(jnp.int32) + base],
                                 axis=1)
    neg_best, pos = jax.lax.top_k(-merged_err, k)
    return -neg_best, jnp.take_along_axis(merged_idx, pos, axis=1)


def nearest_k(queries: np.ndarray, candidates: np.ndarray, k: int,
              q_chunk: int = 8192, c_chunk: int = 16384):
    """Exact k-NN, ascending by distance: (idx [Q,k] i32, err [Q,k] f32).

    Matches ann_kdtree_search_multi's sorted results (extern.pas:66)."""
    q_all = np.asarray(queries, np.float32)
    c_all = np.asarray(candidates, np.float32)
    n_q, n_c = len(q_all), len(c_all)
    out_idx = np.empty((n_q, k), np.int32)
    out_err = np.empty((n_q, k), np.float32)
    for qs in range(0, n_q, q_chunk):
        qe = min(n_q, qs + q_chunk)
        qp = _pad_pow2(qe - qs)
        q = jnp.asarray(_pad_q(q_all[qs:qe], qp))
        q2 = jnp.sum(q * q, axis=1)
        best_err = jnp.full((qp, k), jnp.inf, jnp.float32)
        best_idx = jnp.zeros((qp, k), jnp.int32)
        for cs in range(0, n_c, c_chunk):
            ce = min(n_c, cs + c_chunk)
            chunk = c_all[cs:ce]
            if ce - cs < c_chunk:
                pad = np.full((c_chunk - (ce - cs), chunk.shape[1]),
                              1e9, np.float32)
                chunk = np.concatenate([chunk, pad])
            best_err, best_idx = _topk_step(
                q, q2, jnp.asarray(chunk), best_err, best_idx,
                jnp.int32(cs), k)
        # ensure ascending order (top_k returns descending on negated)
        order = jnp.argsort(best_err, axis=1, stable=True)
        out_idx[qs:qe] = np.asarray(
            jnp.take_along_axis(best_idx, order, axis=1))[:qe - qs]
        out_err[qs:qe] = np.asarray(
            jnp.take_along_axis(best_err, order, axis=1))[:qe - qs]
    return out_idx, out_err
