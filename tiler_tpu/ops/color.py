"""Color science: batched JAX colorspace transforms + host-side integer HSV.

Faithful to the reference conversions: Rec.709 YUV (main.pas:2656-2679),
Wright-Guild/D50 CIELAB (main.pas:2711-2747), integer HSV with Windows
MulDiv rounding (main.pas:3496-3579), gamma handling via direct powers
instead of the 256-entry LUTs (main.pas:592-606) — same math, no table.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import BLUE_MUL, GREEN_MUL, LUMA_DIV, RED_MUL

_U_SCALE = 0.5 / (1.0 - BLUE_MUL / LUMA_DIV)
_V_SCALE = 0.5 / (1.0 - RED_MUL / LUMA_DIV)


def srgb_unit(rgb_u8, gamma_value: float | None):
    """uint8 -> [0,1] floats, optionally gamma-corrected (lut>=0 path)."""
    x = jnp.asarray(rgb_u8).astype(jnp.float32) / 255.0
    if gamma_value is not None:
        x = jnp.power(x, gamma_value)
    return x


def rgb_to_yuv(rgb_unit):
    """[..., 3] unit floats -> YUV. Rec.709 luma weights."""
    r, g, b = rgb_unit[..., 0], rgb_unit[..., 1], rgb_unit[..., 2]
    y = (RED_MUL * r + GREEN_MUL * g + BLUE_MUL * b) / LUMA_DIV
    u = (b - y) * _U_SCALE
    v = (r - y) * _V_SCALE
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv):
    """main.pas:2689-2692 (Rec.709 branch). Returns unit floats."""
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    r = y + v * 1.28033
    g = y - u * 0.21482 - v * 0.38059
    b = y + u * 2.12798
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_lab(rgb_unit):
    """[..., 3] unit floats -> CIELAB (Wright-Guild XYZ, D50)."""
    c = jnp.asarray(rgb_unit)
    c = jnp.where(c > 0.04045, jnp.power((c + 0.055) / 1.055, 2.4), c / 12.92)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    x = (r * 0.49000 + g * 0.31000 + b * 0.20000) / 0.17697
    y = (r * 0.17697 + g * 0.81240 + b * 0.01063) / 0.17697
    z = (r * 0.00000 + g * 0.01000 + b * 0.99000) / 0.17697
    x = x / (96.6797 / 100)
    z = z / (82.5188 / 100)
    xyz = jnp.stack([x, y, z], axis=-1)
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16 / 116)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return jnp.stack([116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)],
                     axis=-1)


def luma_int(rgb_u8):
    """Integer luma in [0,255]: (r*2126+g*7152+b*722) div 10000."""
    x = np.asarray(rgb_u8, np.int64)
    return (x[..., 0] * RED_MUL + x[..., 1] * GREEN_MUL +
            x[..., 2] * BLUE_MUL) // LUMA_DIV


def luma_raw(rgb_u8):
    """Undivided integer luma r*2126+g*7152+b*722 — the mixing-plan sort key
    (Plan.LumaPal, main.pas:1519)."""
    x = np.asarray(rgb_u8, np.int64)
    return (x[..., 0] * RED_MUL + x[..., 1] * GREEN_MUL +
            x[..., 2] * BLUE_MUL)


def color_compare_i32(rgb1, rgb2):
    """ColorCompare (main.pas:1557-1571), vectorized int32 JAX version.

    rgb1/rgb2: [..., 3] int arrays; broadcasting allowed. The luma-weighted
    penalty drives both dithering planners.
    """
    a = jnp.asarray(rgb1, jnp.int32)
    b = jnp.asarray(rgb2, jnp.int32)
    luma1 = a[..., 0] * RED_MUL + a[..., 1] * GREEN_MUL + a[..., 2] * BLUE_MUL
    luma2 = b[..., 0] * RED_MUL + b[..., 1] * GREEN_MUL + b[..., 2] * BLUE_MUL
    # Pascal `div` truncates toward zero; XLA int division matches.
    lumadiff = jax_div_trunc(luma1 - luma2, LUMA_DIV)
    d = a - b
    res = jnp.sum(d * d, axis=-1) * 13
    return res + lumadiff * lumadiff * 32


def jax_div_trunc(x, d):
    """Truncating integer division (Pascal div) for possibly-negative x."""
    q = jnp.abs(x) // d
    return jnp.where(x < 0, -q, q)


# ---------------------------------------------------------------------------
# Host-side integer HSV (used by the Value-at-Risk quantizer's colormap)
# ---------------------------------------------------------------------------

def _muldiv(a, b, c):
    p = a.astype(np.int64) * b
    sign = np.where(p < 0, -1, 1)
    return sign * ((np.abs(p) + c // 2) // c)


def rgb_to_hsv_int_np(rgb):
    """Vectorized integer HSV (main.pas:3496-3543). rgb: [...,3] uint8."""
    rgb = np.asarray(rgb, np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    delta = mx - mn
    nz = delta != 0
    safe_delta = np.where(nz, delta, 1)
    safe_mx = np.where(mx != 0, mx, 1)
    ss = np.where(nz, _muldiv(delta, 255, safe_mx), 0)
    hh = np.zeros_like(r)
    is_r = (r == mx)
    is_g = (g == mx) & ~is_r
    is_b = (b == mx) & ~is_r & ~is_g
    hh = np.where(is_r, _muldiv(g - b, 42, safe_delta), hh)
    hh = np.where(is_g, _muldiv(b - r, 42, safe_delta) + 84, hh)
    hh = np.where(is_b, _muldiv(r - g, 42, safe_delta) + 168, hh)
    # truncating mod 252 then low byte (two's complement for negatives)
    hh = np.where(nz, np.fmod(hh, 252).astype(np.int64) & 0xff, 0)
    return (hh.astype(np.uint8), (ss & 0xff).astype(np.uint8),
            (mx & 0xff).astype(np.uint8))


def hsv_to_rgb_int_np(h, s, v):
    """Vectorized integer HSV->RGB (main.pas:3545-3579)."""
    h = np.asarray(h, np.int64) % 252
    s = np.asarray(s, np.int64)
    v = np.asarray(v, np.int64)
    f = h % 42
    hi = h // 42
    ls = v * s
    p = v - ls // 255
    q = v - (ls * f) // (255 * 42)
    r_ = v - (ls * (42 - f)) // (255 * 42)
    cases = np.stack([
        np.stack([v, r_, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, r_], -1), np.stack([p, q, v], -1),
        np.stack([r_, p, v], -1), np.stack([v, p, q], -1),
    ])  # [6, ..., 3]
    out = np.take_along_axis(
        cases, np.clip(hi, 0, 5)[None, ..., None], axis=0)[0]
    gray = np.broadcast_to(v[..., None], out.shape)
    return np.where((s == 0)[..., None], gray, out).astype(np.uint8)
