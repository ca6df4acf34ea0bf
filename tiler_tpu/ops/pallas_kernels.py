"""Pallas TPU kernels for the codec's hot loops.

1. `nearest_1_pallas` — fused flash-style exact 1-NN: query blocks stay in
   VMEM, candidate chunks stream through the grid, a running (err, idx)
   pair lives in the output block. The [Q,C] distance matrix never touches
   HBM. This replaces the reference's per-cell ANN kd-tree walk
   (/root/reference/main.pas:4027) at MXU speed.
2. `_nn_call_bf16` — the same with bfloat16 dot operands (f32
   accumulation); measured no faster than f32 on v5e (the f32 emulation
   already saturates), kept for precision experiments
   (tools/nn_prec_bench.py).

The kernels have jnp fallbacks (ops.knn); on non-TPU backends they run
in interpreter mode for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


# ---------------------------------------------------------------------------
# Fused streaming 1-NN
# ---------------------------------------------------------------------------

def _nn_kernel(q_ref, c_ref, err_ref, idx_ref):
    """Grid (qi, cj): candidates chunk j against query block qi.

    err/idx output blocks are revisited for every j (index map pins them to
    qi), so they act as running-min accumulators across the candidate walk.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        err_ref[:] = jnp.full_like(err_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]                      # [BQ, D]
    c = c_ref[:]                      # [BC, D]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)        # [BQ, 1]
    c2 = jnp.sum(c * c, axis=1, keepdims=True).T      # [1, BC]
    d = q2 + c2 - 2.0 * jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    local_idx = jnp.argmin(d, axis=1)                 # [BQ]
    local_err = jnp.min(d, axis=1)
    base = j * c.shape[0]
    better = local_err < err_ref[:]
    err_ref[:] = jnp.where(better, local_err, err_ref[:])
    idx_ref[:] = jnp.where(better, local_idx.astype(jnp.int32) + base,
                           idx_ref[:])


@functools.partial(jax.jit, static_argnames=('bq', 'bc', 'interpret'))
def _nn_call(q, c, bq: int, bc: int, interpret: bool):
    nq, d_dim = q.shape
    nc = c.shape[0]
    grid = (nq // bq, nc // bc)
    return pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d_dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq,), jnp.float32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
        ],
        interpret=interpret,
    )(q, c)


def nearest_1_pallas(queries: np.ndarray, candidates: np.ndarray,
                     bq: int = 1024, bc: int = 2048):
    """Exact 1-NN via the fused Pallas kernel.

    Returns (idx [Q] i32, err [Q] f32 squared L2). Inputs are padded to
    block multiples; padding candidates sit at +1e9 per component so they
    never win.
    """
    q = np.asarray(queries, np.float32)
    c = np.asarray(candidates, np.float32)
    nq, nc = len(q), len(c)
    nq_p = -(-nq // bq) * bq
    nc_p = -(-nc // bc) * bc
    if nq_p != nq:
        q = np.concatenate([q, np.zeros((nq_p - nq, q.shape[1]), q.dtype)])
    if nc_p != nc:
        c = np.concatenate(
            [c, np.full((nc_p - nc, c.shape[1]), 1e9, c.dtype)])
    err, idx = _nn_call(jnp.asarray(q), jnp.asarray(c), bq, bc, _interpret())
    return np.asarray(idx)[:nq], np.asarray(err)[:nq]


# ---------------------------------------------------------------------------
# Augmented-matmul variant: the MXU emits the scores directly
# ---------------------------------------------------------------------------

def _nn_kernel_aug(qa_ref, ca_ref, err_ref, idx_ref):
    """As _nn_kernel, but the candidate norms and the -2 factor are folded
    into augmented operands built by the caller:

        qa = [q, 1, 0...]            ca = [-2c, ||c||^2, 0...]
        scores = qa @ ca.T = ||c||^2 - 2 q.c

    The query-norm term ||q||^2 is constant per row (cannot change the
    argmin) and is added to the returned err by the caller. This removes
    the [BQ,BC] broadcast-add VPU passes from the chunk loop — the only
    remaining per-element work is the fused min/argmin reduction.

    MEASURED on the chip (tools/assign_opt_bench.py, 16k x 1M x 192):
    64.2 TF/s vs the broadcast kernel's 69.9 — SLOWER. The kernel is
    MXU-bound (the VPU broadcasts overlap the dot for free) and the 8
    extra contraction dims cost real MXU passes. Kept as the recorded
    negative result; production stays on _nn_kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        err_ref[:] = jnp.full_like(err_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    s = jnp.dot(qa_ref[:], ca_ref[:].T, preferred_element_type=jnp.float32)
    local_idx = jnp.argmin(s, axis=1)
    local_err = jnp.min(s, axis=1)
    base = j * ca_ref.shape[0]
    better = local_err < err_ref[:]
    err_ref[:] = jnp.where(better, local_err, err_ref[:])
    idx_ref[:] = jnp.where(better, local_idx.astype(jnp.int32) + base,
                           idx_ref[:])


def _augment(q, c):
    """Build [*, D+8] augmented operands (padded to keep the contraction
    dim a lane multiple when D=192: 200 -> Mosaic pads to 256, same MXU
    passes as the raw 192)."""
    nq, d_dim = q.shape
    nc = c.shape[0]
    pad = 7
    q2 = jnp.sum(q * q, axis=1)
    c2 = jnp.sum(c * c, axis=1)
    qa = jnp.concatenate(
        [q, jnp.ones((nq, 1), jnp.float32),
         jnp.zeros((nq, pad), jnp.float32)], axis=1)
    ca = jnp.concatenate(
        [-2.0 * c, c2[:, None], jnp.zeros((nc, pad), jnp.float32)], axis=1)
    return qa, ca, q2


@functools.partial(jax.jit, static_argnames=('bq', 'bc', 'interpret'))
def _nn_call_aug(q, c, bq: int, bc: int, interpret: bool):
    nq = q.shape[0]
    nc = c.shape[0]
    qa, ca, q2 = _augment(q, c)
    grid = (nq // bq, nc // bc)
    d_aug = qa.shape[1]
    err, idx = pl.pallas_call(
        _nn_kernel_aug,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_aug), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d_aug), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq,), jnp.float32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
        ],
        interpret=interpret,
    )(qa, ca)
    return err + q2, idx


def _nn_kernel_bf16(q_ref, c_ref, err_ref, idx_ref):
    """As _nn_kernel but the dominant [BQ,D]@[D,BC] dot runs with bfloat16
    OPERANDS and float32 accumulation (one MXU pass instead of the f32
    multi-pass emulation). The norms stay f32."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        err_ref[:] = jnp.full_like(err_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]
    c = c_ref[:]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1, keepdims=True).T
    d = q2 + c2 - 2.0 * jnp.dot(q.astype(jnp.bfloat16),
                                c.astype(jnp.bfloat16).T,
                                preferred_element_type=jnp.float32)
    local_idx = jnp.argmin(d, axis=1)
    local_err = jnp.min(d, axis=1)
    base = j * c.shape[0]
    better = local_err < err_ref[:]
    err_ref[:] = jnp.where(better, local_err, err_ref[:])
    idx_ref[:] = jnp.where(better, local_idx.astype(jnp.int32) + base,
                           idx_ref[:])


@functools.partial(jax.jit, static_argnames=('bq', 'bc', 'interpret'))
def _nn_call_bf16(q, c, bq: int, bc: int, interpret: bool):
    nq, d_dim = q.shape
    nc = c.shape[0]
    grid = (nq // bq, nc // bc)
    return pl.pallas_call(
        _nn_kernel_bf16,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d_dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq,), jnp.float32),
            jax.ShapeDtypeStruct((nq,), jnp.int32),
        ],
        interpret=interpret,
    )(q, c)


# ---------------------------------------------------------------------------
# NOTE: a Pallas VPU kernel for the KModes dissimilarity matrix
# (broadcast Hamming<<11 + L1 over [BN, K, A] int32 lanes) used to live
# here, interpreter-verified but unused in production. Benchmarked on the
# real chip at the production bucket shape ([4096,80] x [256,80]) it
# failed to COMPILE: 130MB of register-allocator spill slots against the
# 128MB VMEM budget. The production path (ops.kmodes.make_dissim_fn)
# expresses the same dissimilarity as ONE fused bf16 one-hot matmul on
# the MXU (3.2x the two-matmul form); the VPU kernel was deleted as
# strictly worse (tools log: /tmp/dissim_fate.py, RESULTS.md).
# ---------------------------------------------------------------------------
