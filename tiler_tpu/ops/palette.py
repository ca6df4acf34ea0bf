"""Palette quantization: Dennis Lee v3 (native) and Value-at-Risk (host).

Reference: QuantizePalette (/root/reference/main.pas:2154-2433) with the two
strategies DoDennisLeeV3 (main.pas:2163-2254, calling dl3quant in the C DLL)
and DoValueAtRiskBased (main.pas:2256-2394), plus the palette-pattern entry
selection built in InitLuts (main.pas:625-641).

The VAR merge loop is inherently sequential and data-dependent; the
reference rescans all adjacent pairs per merge (O(n^2)). Here it runs on the
host with a doubly-linked list + lazy-invalidation heap (O(n log n)), same
merge semantics: repeatedly merge the adjacent pair (in count-sorted order)
with the smallest luma-weighted ColorCompare, weighted-averaging HSV+luma
and rebuilding the RGB from HSV. Tie-breaking among equal-diff pairs uses
insertion order (the reference's unstable scan order is arbitrary there).
"""
from __future__ import annotations

import heapq

import numpy as np

from ..constants import palette_pattern
from . import color
from .. import native

_RGB_W = 13


def _color_compare_scalar(rgb1, rgb2) -> int:
    r1, g1, b1 = int(rgb1[0]), int(rgb1[1]), int(rgb1[2])
    r2, g2, b2 = int(rgb2[0]), int(rgb2[1]), int(rgb2[2])
    luma1 = r1 * 2126 + g1 * 7152 + b1 * 722
    luma2 = r2 * 2126 + g2 * 7152 + b2 * 722
    ld = luma1 - luma2
    lumadiff = -((-ld) // 10000) if ld < 0 else ld // 10000
    return ((r1 - r2) ** 2 + (g1 - g2) ** 2 + (b1 - b2) ** 2) * _RGB_W \
        + lumadiff * lumadiff * 32


DL3_BIN_CAP = 4096


def dl3_palette(pixels_rgb: np.ndarray, palette_size: int,
                bpc: int = 7, bin_cap: int = DL3_BIN_CAP) -> np.ndarray:
    """DL3 palette of the given pixels. Returns [palette_size, 3] uint8.

    Mirrors DoDennisLeeV3: when fewer bins than entries exist the remaining
    entries stay black (the reference's calloc'd palette).

    The reference greedy is O(C^2) in the number of distinct histogram bins
    C; above `bin_cap` we pre-merge the long tail of rare bins into their
    nearest high-count bin (vectorized) and run the exact greedy on the
    capped set. Below the cap the result is byte-identical to the
    reference algorithm."""
    if pixels_rgb.size == 0:
        return np.zeros((palette_size, 3), np.uint8)
    pal, _n = native.dl3_quant_capped(pixels_rgb.reshape(-1, 3),
                                      palette_size, bpc, bin_cap)
    return pal


def dl3_palette_tiles(tiles_rgb: np.ndarray, sel: np.ndarray,
                      palette_size: int, bpc: int = 7,
                      bin_cap: int = DL3_BIN_CAP) -> np.ndarray:
    """dl3_palette over tiles_rgb[sel] with the gather done natively
    (identical result, no [len(sel)*64, 3] host copy)."""
    if len(sel) == 0:
        return np.zeros((palette_size, 3), np.uint8)
    pal, _n = native.dl3_quant_tiles_capped(tiles_rgb, sel, palette_size,
                                            bpc, bin_cap)
    return pal


def var_palette(colors_packed: np.ndarray, counts: np.ndarray,
                total_budget: int, pal_var: float,
                tile_palette_size: int, palette_count: int,
                pattern_row: np.ndarray) -> np.ndarray:
    """Value-at-Risk palette (DoValueAtRiskBased).

    colors_packed: [U] uint32 packed r|g<<8|b<<16 of USED colors;
    counts: [U] usage counts; total_budget: keyframe pixel count
    (FrameCount*TileMapSize*64); pattern_row: gPalettePattern[palIdx].
    Returns [tile_palette_size] packed color indices (possibly duplicated).
    """
    if colors_packed.size == 0:
        return np.zeros(tile_palette_size, np.uint32)

    r = (colors_packed & 0xff).astype(np.int64)
    g = ((colors_packed >> 8) & 0xff).astype(np.int64)
    b = ((colors_packed >> 16) & 0xff).astype(np.int64)
    rgb = np.stack([r, g, b], axis=1)
    h, s, v = color.rgb_to_hsv_int_np(rgb)
    luma = color.luma_int(rgb)

    # sort: count desc, hue asc, val asc, sat asc (CompareCMUCntHLS)
    order = np.lexsort((colors_packed, s, v, h, -counts.astype(np.int64)))
    n = len(order)

    # CmlPct: position where cumulative count reaches pal_var * budget
    acc = int(round(total_budget * pal_var))
    csum = np.cumsum(counts[order.astype(np.int64)])
    hit = np.flatnonzero(csum >= acc)
    cml_pct = int(hit[0]) if hit.size else 0
    cml_pct = max(cml_pct,
                  min(n, tile_palette_size * palette_count))

    # node state (in sorted order)
    cnt = counts[order].astype(np.int64).copy()
    hh = h[order].astype(np.int64).copy()
    ss = s[order].astype(np.int64).copy()
    vv = v[order].astype(np.int64).copy()
    lum = luma[order].astype(np.int64).copy()
    idx = colors_packed[order].astype(np.int64).copy()
    rr, gg, bb = r[order].copy(), g[order].copy(), b[order].copy()

    prv = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    version = np.zeros(n, np.int64)
    dead = np.zeros(n, bool)
    alive = n

    heap: list = []
    seq = 0

    def push_pair(p, j):
        nonlocal seq
        if p < 0 or j >= n:
            return
        d = _color_compare_scalar((rr[j], gg[j], bb[j]),
                                  (rr[p], gg[p], bb[p]))
        heapq.heappush(heap, (d, seq, p, j, version[p], version[j]))
        seq += 1

    for j in range(1, n):
        push_pair(j - 1, j)

    prev_best = None
    while alive > cml_pct:
        # current minimal adjacent diff (lazy-invalidated)
        while heap:
            d, _, p, j, vp, vj = heap[0]
            if version[p] == vp and version[j] == vj and nxt[p] == j:
                break
            heapq.heappop(heap)
        if not heap:
            break
        if prev_best is not None and d == prev_best:
            break  # reference: until best = PrevBest
        prev_best = d
        heapq.heappop(heap)

        # merge p (earlier) into j, weighted by counts (main.pas:2375-2382)
        acc2 = cnt[j] + cnt[p]
        hh[j] = (hh[j] * cnt[j] + hh[p] * cnt[p]) // acc2
        ss[j] = (ss[j] * cnt[j] + ss[p] * cnt[p]) // acc2
        vv[j] = (vv[j] * cnt[j] + vv[p] * cnt[p]) // acc2
        lum[j] = (lum[j] * cnt[j] + lum[p] * cnt[p]) // acc2
        cnt[j] = acc2
        nrgb = color.hsv_to_rgb_int_np(np.array([hh[j]]), np.array([ss[j]]),
                                       np.array([vv[j]]))[0]
        rr[j], gg[j], bb[j] = int(nrgb[0]), int(nrgb[1]), int(nrgb[2])
        idx[j] = int(nrgb[0]) | (int(nrgb[1]) << 8) | (int(nrgb[2]) << 16)
        version[j] += 1
        version[p] += 1
        # unlink p (merges never reorder: list order == index order)
        pp = int(prv[p])
        if pp >= 0:
            nxt[pp] = j
        prv[j] = pp
        dead[p] = True
        alive -= 1
        push_pair(pp, j)
        if nxt[j] < n:
            push_pair(j, int(nxt[j]))

    surv = np.flatnonzero(~dead)
    pos = np.clip(np.round(pattern_row * (len(surv) - 1)).astype(np.int64),
                  0, len(surv) - 1)
    return idx[surv[pos]].astype(np.uint32)


def sort_palette_lhs(entries_packed: np.ndarray) -> np.ndarray:
    """CompareCMULHS sort (main.pas:2081-2090): luma, val, sat, hue asc.

    entries_packed: [S] packed colors -> sorted [S] packed colors."""
    r = (entries_packed & 0xff).astype(np.int64)
    g = (entries_packed >> 8) & 0xff
    b = (entries_packed >> 16) & 0xff
    rgb = np.stack([r, g, b], axis=1)
    h, s, v = color.rgb_to_hsv_int_np(rgb)
    luma = color.luma_int(rgb)
    order = np.lexsort((h, s, v, luma))
    return entries_packed[order]


def packed_to_rgb(packed: np.ndarray) -> np.ndarray:
    p = np.asarray(packed, np.int64)
    return np.stack([p & 0xff, (p >> 8) & 0xff, (p >> 16) & 0xff],
                    axis=-1).astype(np.uint8)


def rgb_to_packed(rgb: np.ndarray) -> np.ndarray:
    x = np.asarray(rgb, np.int64)
    return (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)).astype(np.uint32)


__all__ = ['dl3_palette', 'var_palette', 'sort_palette_lhs',
           'packed_to_rgb', 'rgb_to_packed', 'palette_pattern']
