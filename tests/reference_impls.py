"""Literal NumPy transliterations of the reference's math kernels.

These are the test oracles: each function mirrors the cited Pascal control
flow (/root/reference/main.pas) as directly as possible, loops and all. The
production implementations in tiler_tpu.ops are checked against these. They
also serve as the CPU baseline for bench speedup numbers.
"""
import numpy as np

TILE_W = 8
RED_MUL, GREEN_MUL, BLUE_MUL = 2126, 7152, 722
LUMA_DIV = RED_MUL + GREEN_MUL + BLUE_MUL
RGB_W = 13


def gamma_correct(gamma_luts, lut, x):
    """gGammaCorLut lookup (main.pas:599-606, 644-647); lut=-1 -> x/255."""
    if lut < 0:
        return x / 255.0
    return gamma_luts[lut][x]


def rgb_to_yuv(r, g, b, gamma_luts, gamma_cor):
    """main.pas:2656-2679."""
    fr = gamma_correct(gamma_luts, gamma_cor, r)
    fg = gamma_correct(gamma_luts, gamma_cor, g)
    fb = gamma_correct(gamma_luts, gamma_cor, b)
    y = (RED_MUL * fr + GREEN_MUL * fg + BLUE_MUL * fb) / LUMA_DIV
    u = (fb - y) * (0.5 / (1.0 - BLUE_MUL / LUMA_DIV))
    v = (fr - y) * (0.5 / (1.0 - RED_MUL / LUMA_DIV))
    return y, u, v


def rgb_to_lab(ir, ig, ib, gamma_luts, gamma_cor):
    """main.pas:2711-2747 (Wright-Guild XYZ, D50 illuminant)."""
    r = gamma_correct(gamma_luts, gamma_cor, ir)
    g = gamma_correct(gamma_luts, gamma_cor, ig)
    b = gamma_correct(gamma_luts, gamma_cor, ib)

    r = ((r + 0.055) / 1.055) ** 2.4 if r > 0.04045 else r / 12.92
    g = ((g + 0.055) / 1.055) ** 2.4 if g > 0.04045 else g / 12.92
    b = ((b + 0.055) / 1.055) ** 2.4 if b > 0.04045 else b / 12.92

    x = (r * 0.49000 + g * 0.31000 + b * 0.20000) / 0.17697
    y = (r * 0.17697 + g * 0.81240 + b * 0.01063) / 0.17697
    z = (r * 0.00000 + g * 0.01000 + b * 0.99000) / 0.17697

    x /= 96.6797 / 100
    y /= 100.000 / 100
    z /= 82.5188 / 100

    x = x ** (1 / 3) if x > 0.008856 else (7.787 * x) + 16 / 116
    y = y ** (1 / 3) if y > 0.008856 else (7.787 * y) + 16 / 116
    z = z ** (1 / 3) if z > 0.008856 else (7.787 * z) + 16 / 116

    return (116 * y) - 16, 500 * (x - y), 200 * (y - z)


def wavelet_gs(data):
    """WaveletGS depth-2 on an 8x8 plane (main.pas:2805-2840).

    In-place-layout faithful: each level transforms the top-left dx x dy
    region of the stride-8 buffer."""
    out = data.astype(np.float64).copy()
    factor = 1.0 / np.sqrt(2.0)

    def one_level(buf, dx, dy):
        tmpx = buf.copy()
        for y in range(dy):
            for x in range(dx // 2):
                a, b = buf[y, x * 2], buf[y, x * 2 + 1]
                tmpx[y, x] = (a + b) * factor
                tmpx[y, x + dx // 2] = (a - b) * factor
        tmpy = tmpx.copy()
        for x in range(dx):
            for y in range(dy // 2):
                a, b = tmpx[y * 2, x], tmpx[y * 2 + 1, x]
                tmpy[y, x] = (a + b) * factor
                tmpy[y + dy // 2, x] = (a - b) * factor
        return tmpy

    dx = dy = TILE_W
    for _ in range(3):  # depth=2 -> 3 levels (8x8, 4x4, 2x2)
        out[:dy, :dx] = one_level(out[:dy, :dx].copy(), dx, dy)[:dy, :dx]
        dx //= 2
        dy //= 2
    return out


def dct_quant_table():
    """cDCTQuantization (main.pas:63-98)."""
    from tiler_tpu.constants import DCT_QUANT
    return DCT_QUANT.astype(np.float64)


def uv_ratio():
    r = np.ones((TILE_W, TILE_W))
    r[0, :] = np.sqrt(0.5)
    r[:, 0] = np.sqrt(0.5)
    r[0, 0] = 0.5
    return r


def compute_tile_psyvis_features(tile_rgb=None, tile_pal=None, pal=None,
                                 from_pal=False, use_wavelets=False,
                                 use_lab=False, q_weighting=False,
                                 hmirror=False, vmirror=False,
                                 gamma_luts=(), gamma_cor=-1):
    """ComputeTilePsyVisFeatures (main.pas:2997-3177).

    tile_rgb: [8,8,3] uint8; tile_pal: [8,8] uint8; pal: [S,3] uint8.
    Returns [192] float64 in plane-major (cpn, v, u) order.
    """
    cpn_pixels = np.zeros((3, TILE_W, TILE_W))
    for y in range(TILE_W):
        for x in range(TILE_W):
            xx = TILE_W - 1 - x if hmirror else x
            yy = TILE_W - 1 - y if vmirror else y
            if from_pal:
                r, g, b = pal[tile_pal[yy, xx]]
            else:
                r, g, b = tile_rgb[yy, xx]
            if use_lab:
                c0, c1, c2 = rgb_to_lab(int(r), int(g), int(b),
                                        gamma_luts, gamma_cor)
            else:
                c0, c1, c2 = rgb_to_yuv(int(r), int(g), int(b),
                                        gamma_luts, gamma_cor)
            cpn_pixels[0, y, x] = c0
            cpn_pixels[1, y, x] = c1
            cpn_pixels[2, y, x] = c2

    out = np.zeros(3 * TILE_W * TILE_W)
    if use_wavelets:
        for cpn in range(3):
            out[cpn * 64:(cpn + 1) * 64] = wavelet_gs(cpn_pixels[cpn]).ravel()
        return out

    quant = dct_quant_table()
    ratio = uv_ratio()
    i = 0
    for cpn in range(3):
        for v in range(TILE_W):
            for u in range(TILE_W):
                z = 0.0
                for y in range(TILE_W):
                    for x in range(TILE_W):
                        z += cpn_pixels[cpn, y, x] * \
                            np.cos((x + 0.5) * u * np.pi / 16.0) * \
                            np.cos((y + 0.5) * v * np.pi / 16.0)
                if q_weighting:
                    z *= quant[cpn, v, u]
                out[i] = z * ratio[v, u]
                i += 1
    return out


def pearson_correlation(x, y):
    """main.pas:1465-1492."""
    mx, my = np.mean(x), np.mean(y)
    num = np.sum((x - mx) * (y - my))
    den = np.sqrt(np.sum((x - mx) ** 2)) * np.sqrt(np.sum((y - my) ** 2))
    return 0.0 if den == 0 else num / den


def color_compare(r1, g1, b1, r2, g2, b2):
    """ColorCompare (main.pas:1557-1571): luma-weighted squared RGB."""
    luma1 = r1 * RED_MUL + g1 * GREEN_MUL + b1 * BLUE_MUL
    luma2 = r2 * RED_MUL + g2 * GREEN_MUL + b2 * BLUE_MUL
    ld = luma1 - luma2
    lumadiff = -((-ld) // LUMA_DIV) if ld < 0 else ld // LUMA_DIV  # Pascal div
    res = (r1 - r2) ** 2 * RGB_W
    res += (g1 - g2) ** 2 * RGB_W
    res += (b1 - b2) ** 2 * RGB_W
    res += lumadiff * lumadiff * 32
    return res


def matching_dissim(a, b):
    """KModes dissimilarity (kmodes.pas:239-250): Hamming*2^11 + L1."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    return int(np.sum(a != b) << 11) + int(np.sum(np.abs(a - b)))


def devise_best_mixing_plan_thomas_knoll(palette, col, luma_pal):
    """main.pas:1828-1875: 64-step pattern dithering plan, luma-sorted.

    palette: [S,3] int (r,g,b); col: (r,g,b); luma_pal: [S] int lumas.
    """
    src = np.array(col, np.int64)
    s = src.copy()
    e = np.zeros(3, np.int64)
    plan = np.zeros(64, np.int64)

    def trunc_div(x, d):  # Pascal div
        return np.where(x < 0, -((-x) // d), x // d)

    for c in range(64):
        t = s + trunc_div(e * 9, 100)
        pens = [color_compare(t[0], t[1], t[2], p[0], p[1], p[2])
                for p in palette]
        chosen = int(np.argmin(pens))  # first minimum wins (strict <)
        plan[c] = chosen
        e += s - palette[chosen]
    # stable sort by palette luma (PlanCompareLuma, main.pas:1544-1555)
    order = np.argsort([luma_pal[p] for p in plan], kind='stable')
    return plan[order]


def devise_best_mixing_plan_yliluoma(palette, col, luma_pal, mixed):
    """Scalar Yliluoma-2 planner (main.pas:1753-1794 fallback path)."""
    so_far = [0, 0, 0]
    plan = []
    while len(plan) < mixed:
        plan_count = len(plan)
        max_test = max(1, plan_count)
        least = None
        chosen, chosen_amount = 0, 1
        for index in range(len(palette)):
            s = list(so_far)
            add = [int(palette[index][0]), int(palette[index][1]),
                   int(palette[index][2])]
            for t in range(plan_count + 1, plan_count + max_test + 1):
                s[0] += add[0]
                s[1] += add[1]
                s[2] += add[2]
                add[0] += 1
                add[1] += 1
                add[2] += 1
                pen = color_compare(col[0], col[1], col[2],
                                    s[0] // t, s[1] // t, s[2] // t)
                if least is None or pen < least:
                    least = pen
                    chosen = index
                    chosen_amount = t - plan_count
        chosen_amount = min(chosen_amount, 256 - plan_count)
        plan.extend([chosen] * chosen_amount)
        for c in range(3):
            so_far[c] += int(palette[chosen][c]) * chosen_amount
    plan = np.array(plan)
    order = np.argsort([luma_pal[p] for p in plan], kind='stable')
    return plan[order]


def rgb_to_hsv_int(r, g, b):
    """Integer HSV (main.pas:3496-3543), MulDiv semantics."""
    mx = max(r, g, b)
    mn = min(r, g, b)
    hh, ss, ll = 0, 0, mx
    if ll != mn:
        delta = ll - mn

        def muldiv(a, bb, c):
            # Windows MulDiv: rounds-to-nearest, magnitude-based for negatives
            p = a * bb
            sign = -1 if p < 0 else 1
            return sign * ((abs(p) + c // 2) // c)

        ss = muldiv(delta, 255, ll)
        if r == ll:
            hh = muldiv(42, g - b, delta)
        elif g == ll:
            hh = muldiv(42, b - r, delta) + 84
        elif b == ll:
            hh = muldiv(42, r - g, delta) + 168
        # Pascal mod truncates toward zero (keeps sign of dividend)
        hh = hh - (abs(hh) // 252) * 252 * (1 if hh >= 0 else -1)
    return hh & 0xff, ss & 0xff, ll & 0xff


def hsv_to_rgb_int(h, s, v):
    """main.pas:3545-3579."""
    if s == 0:
        return v, v, v
    h = h % 252
    f = h % 42
    h = h // 42
    ls = v * s
    p = v - ls // 255
    q = v - (ls * f) // (255 * 42)
    r = v - (ls * (42 - f)) // (255 * 42)
    return [(v, r, p), (q, v, p), (p, v, r),
            (p, q, v), (r, p, v), (v, p, q)][h] if h < 6 else (0, 0, 0)
