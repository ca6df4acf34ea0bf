"""Encoder state: the dense-array replacement for the reference's object
graph (TTile pointers / TFrame / TKeyFrame classes, main.pas:152-246).

Everything is a flat numpy array with masks instead of pointer liveness;
device copies are made inside the steps that need them. Shapes:

  frames_rgb   [F, H, W, 3] u8     source pixels (screen-cropped)
  fs_pixels    [F, H, W, 3] u8     FS-posterized pixels (== frames at 8bpc)
  tm_*         [F, TH, TW]         tilemap (tile idx / palette / mirrors)
  stm_*        [F, TH, TW]         smoothed tilemap copy (Smooth step)
  tiles_rgb    [N, 8, 8, 3] u8     global tile RGB
  tiles_pal    [N, 8, 8] u8        global tile palette indices (dithered)
  tile_*       [N]                 per-tile flags/counters
  keyframes    [K, 2] i32          inclusive [start, end] frame ranges
  palettes_rgb [K, P, S, 3] u8     final per-keyframe palettes
  palette_centroids [K, P, 192]    k-means centroids kept for FrameTiling

Mirror convention: tiles_pal stores the zone-canonicalized orientation
(PrepareTileMirrors, main.pas:4049-4069 bakes mirrors in); tm_h/tm_v are
the EFFECTIVE mirrors to apply to the stored pixels when rendering. The
reference instead tracks tile-baked flags separately and XORs at save time
(main.pas:4715); folding the XOR into the tilemap at canonicalization time
produces the same bitstream with one convention everywhere.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import EncoderConfig
from ..constants import TILE_W


@dataclasses.dataclass
class EncoderState:
    config: EncoderConfig
    fps: float = 24.0
    tilemap_w: int = 0
    tilemap_h: int = 0

    frames_rgb: Optional[np.ndarray] = None
    fs_pixels: Optional[np.ndarray] = None

    tm_tile: Optional[np.ndarray] = None   # int32
    tm_pal: Optional[np.ndarray] = None    # int32 (-1 until dithered)
    tm_h: Optional[np.ndarray] = None      # bool
    tm_v: Optional[np.ndarray] = None      # bool
    stm_tile: Optional[np.ndarray] = None
    stm_pal: Optional[np.ndarray] = None
    stm_h: Optional[np.ndarray] = None
    stm_v: Optional[np.ndarray] = None
    stm_smooth: Optional[np.ndarray] = None  # bool

    tiles_rgb: Optional[np.ndarray] = None
    tiles_pal: Optional[np.ndarray] = None
    tile_active: Optional[np.ndarray] = None
    tile_use: Optional[np.ndarray] = None
    tile_dpi: Optional[np.ndarray] = None    # DitheringPalIndex

    keyframes: Optional[np.ndarray] = None
    palettes_rgb: Optional[np.ndarray] = None
    palette_centroids: Optional[np.ndarray] = None

    step_times: dict = dataclasses.field(default_factory=dict)
    metrics: dict = dataclasses.field(default_factory=dict)
    _dev_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    def device_tiles_rgb(self):
        """tiles_rgb resident on device, uploaded once per array identity
        (the tunnel's H2D bandwidth makes repeated uploads the dominant
        cost of the dither phase)."""
        import jax.numpy as jnp
        key = ('tiles_rgb', id(self.tiles_rgb))
        if self._dev_cache.get('key') != key:
            self._dev_cache = {'key': key,
                               'arr': jnp.asarray(self.tiles_rgb)}
        return self._dev_cache['arr']

    @property
    def n_frames(self) -> int:
        return 0 if self.frames_rgb is None else len(self.frames_rgb)

    @property
    def tilemap_size(self) -> int:
        return self.tilemap_w * self.tilemap_h

    @property
    def screen_w(self) -> int:
        return self.tilemap_w * TILE_W

    @property
    def screen_h(self) -> int:
        return self.tilemap_h * TILE_W

    @property
    def n_tiles(self) -> int:
        return 0 if self.tiles_pal is None else len(self.tiles_pal)

    def active_tile_count(self) -> int:
        return int(self.tile_active.sum())

    def kf_of_frame(self) -> np.ndarray:
        """[F] keyframe index per frame."""
        kf = np.zeros(self.n_frames, np.int32)
        for k, (s, e) in enumerate(self.keyframes):
            kf[s:e + 1] = k
        return kf
