"""Device mesh construction: the distributed communication backend's axes.

The reference has no distribution at all — a shared-memory thread pool is
its only parallelism (SURVEY.md §2.4). This module builds the TPU-native
2-D mesh designed in SURVEY.md §5.8 ('gop' over DCN-ish / 'frame' over
ICI). The production sharded execution lives in parallel.mesh_pipeline
(frame-sharded FrameTiling/dither wired into the pipeline steps) and
parallel.sharded_ops (library ops with psum/all_gather collectives).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


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
