"""Device mesh + sharded encode step: the distributed communication backend.

The reference has no distribution at all — a shared-memory thread pool is
its only parallelism (SURVEY.md §2.4). This module introduces the TPU-native
equivalent designed in SURVEY.md §5.8: a 2-D mesh ('gop' over DCN-ish /
'frame' over ICI), frames of a GOP sharded across the 'frame' axis, GOPs
across 'gop', with
  (a) psum allreduce of k-means/KModes statistics so palette clustering
      stays globally consistent,
  (b) all_gather of per-shard candidate tilesets before global tiling /
      frame tiling,
  (c) psum of residual-error metrics.
All collectives ride jax.shard_map over the mesh; XLA lowers them to
ICI/DCN collectives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import TILE_DCT_SIZE
from ..ops import features


def make_mesh(n_devices: int | None = None, gop_axis: int | None = None
              ) -> Mesh:
    """2-D mesh ('gop','frame'). gop_axis defaults to the largest power-of-2
    divisor <= sqrt(n) so both axes are populated when possible."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if gop_axis is None:
        # largest power-of-2 divisor of n not exceeding sqrt(n)
        gop_axis = 1
        d = 2
        while n % d == 0 and d * d <= n:
            gop_axis = d
            d *= 2
    return Mesh(np.array(devices).reshape(gop_axis, n // gop_axis),
                ('gop', 'frame'))


def sharded_encode_step(mesh: Mesh, palette_count: int,
                        use_wavelets: bool = True, cand_per_shard: int = 64):
    """Builds the jitted multi-chip encode step.

    One step, given each shard's tiles [n_local, 8, 8, 3] u8 and the
    replicated palette-clustering centroids [P, 192]:
      1. PsyV features of the local tiles (MXU, local);
      2. k-means assignment + one centroid update with cross-mesh psum
         (the yakmo/KModes allreduce of SURVEY §5.8);
      3. all_gather of each shard's first cand_per_shard tile features (the
         global-tileset exchange) and a local 1-NN assignment against the
         gathered candidate set (the FrameTiling search pattern);
      4. psum of the residual error metric.
    Returns fn(tiles_u8_sharded, centroids) ->
      (new_centroids, labels_sharded, nn_idx_sharded, residual_scalar).
    """
    axes = ('gop', 'frame')

    def step(tiles_u8, cents):
        feats = features.psyv_features_rgb(
            tiles_u8, use_wavelets=use_wavelets)  # [n_loc, 192]
        # k-means assign + allreduced update
        c2 = jnp.sum(cents * cents, axis=1)
        d = (jnp.sum(feats * feats, 1)[:, None] + c2[None, :]
             - 2.0 * (feats @ cents.T))
        labels = jnp.argmin(d, axis=1).astype(jnp.int32)
        onehot = jax.nn.one_hot(labels, palette_count, dtype=jnp.float32)
        sums = jax.lax.psum(onehot.T @ feats, axes)
        counts = jax.lax.psum(jnp.sum(onehot, 0), axes)
        new_cents = jnp.where(counts[:, None] > 0,
                              sums / jnp.maximum(counts, 1.0)[:, None],
                              cents)
        # candidate tileset exchange + 1-NN against the gathered set
        cand_local = feats[:cand_per_shard]
        cand = jax.lax.all_gather(cand_local, axes, tiled=True)
        cd = (jnp.sum(feats * feats, 1)[:, None]
              + jnp.sum(cand * cand, 1)[None, :]
              - 2.0 * (feats @ cand.T))
        nn_idx = jnp.argmin(cd, axis=1).astype(jnp.int32)
        residual = jax.lax.psum(jnp.sum(jnp.min(cd, axis=1)), axes)
        return new_cents, labels, nn_idx, residual

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(('gop', 'frame')), P(None, None)),
        out_specs=(P(None, None), P(('gop', 'frame')),
                   P(('gop', 'frame')), P()),
        check_vma=False)
    return jax.jit(sharded)


def shard_batch(mesh: Mesh, arr: np.ndarray):
    """Places a leading-axis batch with ('gop','frame')-sharded rows."""
    sharding = NamedSharding(mesh, P(('gop', 'frame')))
    return jax.device_put(arr, sharding)
