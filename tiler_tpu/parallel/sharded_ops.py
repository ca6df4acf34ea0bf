"""Data-parallel sharded versions of the encoder's heavy device ops.

These shard the batch (tiles / cells) across every device of a mesh and
keep model-side state (centroids, candidate sets) replicated — the P1/P2
frame- and keyframe-parallelism of the reference's thread pool
(SURVEY.md §2.4) mapped onto chips, with psum allreduce where the
reference shared memory:

  - sharded_psyv_features : pure DP, no communication
  - sharded_kmeans        : local assign + psum(sums, counts) allreduce per
                            iteration (the yakmo-replacement at scale)
  - sharded_nearest_1     : queries sharded, candidates replicated

All ops accept any ('gop','frame') mesh from parallel.mesh.make_mesh and
degrade gracefully to a single device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import features

_AXES = ('gop', 'frame')


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def sharded_psyv_features(mesh: Mesh, tiles_rgb: np.ndarray,
                          gamma_value=None, use_lab=False,
                          use_wavelets=False, q_weighting=False):
    """[N,8,8,3] u8 -> [N,192] f32 with the batch sharded across devices."""
    n = len(tiles_rgb)
    n_dev = mesh.devices.size
    n_pad = _pad_to(max(n, n_dev), n_dev * 256)
    tp = np.concatenate(
        [tiles_rgb,
         np.zeros((n_pad - n, 8, 8, 3), np.uint8)]) if n_pad != n \
        else tiles_rgb
    sh = NamedSharding(mesh, P(_AXES))
    x = jax.device_put(tp, sh)

    @functools.partial(jax.jit, out_shardings=sh)
    def run(t):
        cpn = features.rgb_tiles_to_cpn(t, gamma_value, use_lab)
        return features.psyv_from_cpn(cpn, use_wavelets=use_wavelets,
                                      q_weighting=q_weighting)

    return np.asarray(run(x))[:n]


def sharded_kmeans(mesh: Mesh, feats: np.ndarray, k: int,
                   max_iters: int = 100, seed: int = 0x42381337):
    """Distributed Lloyd's k-means: features sharded over all devices,
    centroid statistics allreduced with psum each iteration.

    Returns (labels [N] i32, centroids [k,D] f32)."""
    n, d = feats.shape
    n_dev = mesh.devices.size
    n_pad = _pad_to(max(n, n_dev * 8), n_dev * 8)
    fp = np.concatenate([feats, np.zeros((n_pad - n, d), feats.dtype)]) \
        if n_pad != n else feats
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    data_sh = NamedSharding(mesh, P(_AXES))
    x = jax.device_put(np.asarray(fp, np.float32), data_sh)
    v = jax.device_put(valid, data_sh)

    # deterministic k-means++ init on replicated data head (cheap): use the
    # single-device init from ops.kmeans on a subsample for seeding
    from ..ops.kmeans import _plus_plus_init
    sub = np.asarray(fp[:min(n_pad, 16384)], np.float32)
    cents0 = np.asarray(_plus_plus_init(jnp.asarray(sub), k,
                                        jax.random.PRNGKey(seed)))

    def step(x_loc, v_loc, cents):
        c2 = jnp.sum(cents * cents, axis=1)
        dist = (jnp.sum(x_loc * x_loc, 1)[:, None] + c2[None, :]
                - 2.0 * (x_loc @ cents.T))
        lab = jnp.argmin(dist, axis=1)
        w = v_loc.astype(jnp.float32)
        onehot = jax.nn.one_hot(lab, k, dtype=jnp.float32) * w[:, None]
        sums = jax.lax.psum(onehot.T @ x_loc, _AXES)
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), _AXES)
        new_cents = jnp.where(counts[:, None] > 0,
                              sums / jnp.maximum(counts, 1.0)[:, None],
                              cents)
        moved = jax.lax.psum(
            jnp.sum(jnp.abs(new_cents - cents)), _AXES) / mesh.devices.size
        return lab.astype(jnp.int32), new_cents, moved

    sharded_step = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(_AXES), P(_AXES), P(None, None)),
        out_specs=(P(_AXES), P(None, None), P()),
        check_vma=False))

    cents = jnp.asarray(cents0)
    labels = None
    for _ in range(max_iters):
        labels, new_cents, moved = sharded_step(x, v, cents)
        if float(moved) == 0.0:
            cents = new_cents
            break
        cents = new_cents
    return np.asarray(labels)[:n], np.asarray(cents)


def sharded_nearest_1(mesh: Mesh, queries: np.ndarray,
                      candidates: np.ndarray, c_chunk: int = 8192):
    """Queries sharded across devices, candidates replicated; exact 1-NN."""
    n = len(queries)
    n_dev = mesh.devices.size
    n_pad = _pad_to(max(n, n_dev), n_dev * 8)
    qp = np.concatenate(
        [queries, np.zeros((n_pad - n, queries.shape[1]),
                           queries.dtype)]) if n_pad != n else queries
    n_c = len(candidates)
    n_chunks = max(1, -(-n_c // c_chunk))
    cp = np.full((n_chunks * c_chunk, candidates.shape[1]), 1e9, np.float32)
    cp[:n_c] = candidates
    cands = cp.reshape(n_chunks, c_chunk, -1)

    data_sh = NamedSharding(mesh, P(_AXES))
    q = jax.device_put(np.asarray(qp, np.float32), data_sh)
    c = jax.device_put(cands, NamedSharding(mesh, P(None, None, None)))

    def local(q_loc, cands_rep):
        q2 = jnp.sum(q_loc * q_loc, axis=1)

        def stepf(carry, chunk):
            best_err, best_idx, base = carry
            c2 = jnp.sum(chunk * chunk, axis=1)
            dmat = q2[:, None] + c2[None, :] - 2.0 * (q_loc @ chunk.T)
            idx = jnp.argmin(dmat, axis=1)
            err = jnp.take_along_axis(dmat, idx[:, None], axis=1)[:, 0]
            take = err < best_err
            return (jnp.where(take, err, best_err),
                    jnp.where(take, idx.astype(jnp.int32) + base, best_idx),
                    base + chunk.shape[0]), None

        init = (jnp.full(q_loc.shape[0], jnp.inf, jnp.float32),
                jnp.zeros(q_loc.shape[0], jnp.int32), jnp.int32(0))
        (err, idx, _), _ = jax.lax.scan(stepf, init, cands_rep)
        return idx, err

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(_AXES), P(None, None, None)),
        out_specs=(P(_AXES), P(_AXES)),
        check_vma=False))
    idx, err = fn(q, c)
    return np.asarray(idx)[:n], np.asarray(err)[:n]
