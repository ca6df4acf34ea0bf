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


def var_quantize(colors_packed, counts, total_budget, pal_var,
                 tile_palette_size, palette_count, pattern_row):
    """Literal DoValueAtRiskBased (main.pas:2256-2394) with full O(n^2)
    rescans. colors_packed/counts cover used colors only (count>0)."""
    ents = []
    for cp, cn in zip(colors_packed, counts):
        r, g, b = cp & 0xff, (cp >> 8) & 0xff, (cp >> 16) & 0xff
        h, s, v = rgb_to_hsv_int(int(r), int(g), int(b))
        luma = (r * RED_MUL + g * GREEN_MUL + b * BLUE_MUL) // LUMA_DIV
        ents.append(dict(count=int(cn), index=int(cp), hue=h, sat=s, val=v,
                         luma=int(luma), r=int(r), g=int(g), b=int(b)))
    ents.sort(key=lambda e: (-e['count'], e['hue'], e['val'], e['sat'],
                             e['index']))
    n = len(ents)

    acc = round(total_budget * pal_var)
    cml_pct = 0
    for i, e in enumerate(ents):
        acc -= e['count']
        if acc <= 0:
            cml_pct = i
            break
    cml_pct = max(cml_pct, min(n, tile_palette_size * palette_count))

    best = None
    while True:
        if len(ents) <= cml_pct:
            break
        prev_best = best
        best = None
        best_i = -1
        for i in range(1, len(ents)):
            d = color_compare(ents[i]['r'], ents[i]['g'], ents[i]['b'],
                              ents[i - 1]['r'], ents[i - 1]['g'],
                              ents[i - 1]['b'])
            if best is None or d < best:
                best = d
                best_i = i
        if prev_best is not None and best == prev_best:
            break
        if best_i > 0:
            ci, cj = ents[best_i], ents[best_i - 1]
            acc2 = ci['count'] + cj['count']
            for k in ('hue', 'sat', 'val', 'luma'):
                ci[k] = (ci[k] * ci['count'] + cj[k] * cj['count']) // acc2
            ci['count'] = acc2
            r, g, b = hsv_to_rgb_int(ci['hue'], ci['sat'], ci['val'])
            ci['r'], ci['g'], ci['b'] = r, g, b
            ci['index'] = r | (g << 8) | (b << 16)
            del ents[best_i - 1]

    out = []
    for i in range(tile_palette_size):
        pos = int(round(pattern_row[i] * (len(ents) - 1)))
        out.append(ents[pos]['index'])
    return np.array(out, np.uint32)


def dl3_quant(pixels_rgb, quant_to, bpc):
    """Literal dl3quant (quantizer.c:437-663) for small inputs."""
    mbpc = (1 << bpc) - 1
    bins = {}
    for (r, g, b) in pixels_rgb.reshape(-1, 3).astype(np.int64):
        idx = (b * mbpc // 255) | ((g * mbpc // 255) << bpc) \
            | ((r * mbpc // 255) << (2 * bpc))
        e = bins.setdefault(idx, [0, 0, 0, 0])
        e[0] += int(r)
        e[1] += int(g)
        e[2] += int(b)
        e[3] += 1
    t = []
    for idx in sorted(bins):
        r, g, b, c = bins[idx]
        v2 = c >> 1
        t.append(dict(r=r, g=g, b=b, n=c, rr=(r + v2) // c,
                      gg=(g + v2) // c, bb=(b + v2) // c,
                      err=np.inf, cc=0))

    def calc_err(c1, c2):
        a, bb_ = t[c1], t[c2]
        p1, p2 = a['n'], bb_['n']
        p3 = p1 + p2
        r3 = (a['r'] + bb_['r'] + p3 // 2) // p3
        g3 = (a['g'] + bb_['g'] + p3 // 2) // p3
        b3 = (a['b'] + bb_['b'] + p3 // 2) // p3
        d1 = np.float32((r3 - a['rr']) ** 2 + (g3 - a['gg']) ** 2 +
                        (b3 - a['bb']) ** 2)
        d2 = np.float32((bb_['rr'] - r3) ** 2 + (bb_['gg'] - g3) ** 2 +
                        (bb_['bb'] - b3) ** 2)
        return np.float32(np.float32(np.sqrt(d1)) * p1 +
                          np.float32(np.sqrt(d2)) * p2)

    def recount_next(i, tot):
        err, c2 = np.inf, 0
        for j in range(i + 1, tot):
            e = calc_err(i, j)
            if e < err:
                err, c2 = e, j
        t[i]['err'], t[i]['cc'] = err, c2

    def recount_dist(c1, tot):
        recount_next(c1, tot)
        for i in range(c1):
            if t[i]['cc'] == c1:
                recount_next(i, tot)
            else:
                e = calc_err(i, c1)
                if e < t[i]['err']:
                    t[i]['err'], t[i]['cc'] = e, c1

    tot = len(t)
    if tot > quant_to:
        for i in range(tot - 1):
            recount_next(i, tot)
        t[tot - 1]['err'] = np.inf
        t[tot - 1]['cc'] = tot
        while tot > quant_to:
            err, c1 = np.inf, 0
            for i in range(tot):
                if t[i]['err'] < err:
                    err, c1 = t[i]['err'], i
            c2 = t[c1]['cc']
            for k in 'rgb':
                t[c2][k] += t[c1][k]
            t[c2]['n'] += t[c1]['n']
            v2 = t[c2]['n'] >> 1
            t[c2]['rr'] = (t[c2]['r'] + v2) // t[c2]['n']
            t[c2]['gg'] = (t[c2]['g'] + v2) // t[c2]['n']
            t[c2]['bb'] = (t[c2]['b'] + v2) // t[c2]['n']
            tot -= 1
            t[c1] = dict(t[tot])
            t[tot - 1]['err'] = np.inf
            t[tot - 1]['cc'] = tot
            for i in range(c1):
                if t[i]['cc'] == tot:
                    t[i]['cc'] = c1
            for i in range(c1 + 1, tot):
                if t[i]['cc'] == tot:
                    recount_next(i, tot)
            recount_dist(c1, tot)
            if c2 != tot:
                recount_dist(c2, tot)
    pal = np.zeros((quant_to, 3), np.uint8)
    for i in range(min(tot, quant_to)):
        pal[i] = (t[i]['rr'], t[i]['gg'], t[i]['bb'])
    return pal


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


def keyframe_ranges_oracle(corr, tilemap_size, n_frames):
    """Shot/keyframe detection loop (main.pas:1099-1155, constants at
    main.pas:985-990): EWMA of inter-frame correlation, hard/soft ratio
    thresholds, grace period, per-keyframe tile budget. Mirrors the
    Pascal structure: frames are ASSIGNED to keyframe ids first, ranges
    are recovered afterwards by a min/max scan (main.pas:1148-1155)."""
    C_MAX_TILES = 24 * 1920 * 1080 // (TILE_W * TILE_W)
    C_GRACE = 24
    C_SAVG = 6
    C_SOFT = 0.9
    C_HARD = 0.5

    kf_of_frame = np.zeros(n_frames, np.int64)
    kf_idx = 0
    av = -1.0
    last_kf_idx = 0
    for i in range(1, n_frames):
        v = float(corr[i - 1])
        if av == -1.0:
            av = v
        else:
            av = av * (1.0 - 1.0 / C_SAVG) + v * (1.0 / C_SAVG)
        ratio = max(0.01, v) / max(0.01, av)
        is_kf = (ratio < C_HARD) or \
            ((ratio < C_SOFT) and ((i - last_kf_idx + 1) > C_GRACE)) or \
            ((i - last_kf_idx + 1) * tilemap_size > C_MAX_TILES)
        if is_kf:
            kf_idx += 1
            av = -1.0
            last_kf_idx = i
        kf_of_frame[i] = kf_idx

    ranges = np.zeros((kf_idx + 1, 2), np.int32)
    for j in range(kf_idx + 1):
        members = np.flatnonzero(kf_of_frame == j)
        ranges[j] = [members.min(), members.max()]
    return ranges


def dither_floyd_steinberg_oracle(frame_rgb, bits_per_comp):
    """DitherFloydSteinberg (main.pas:1966-1996), pointer-walk form: flat
    byte buffer, neighbor offsets collapsing to 0 at the borders (the
    error then lands on the current/processed pixels), EnsureRange
    clamping."""
    h, w, _ = frame_rgb.shape
    cvt_pre = (1 << bits_per_comp) - 1
    cvt_post = 256 // cvt_pre
    px = list(frame_rgb.reshape(-1).astype(int))
    p = 0
    for y in range(h):
        for x in range(w):
            yp = w * 3 if y < h - 1 else 0
            xp = 3 if x < w - 1 else 0
            xm = -3 if x > 0 else 0
            for _c in range(3):
                old = px[p]
                new = min(255, ((old * cvt_pre) // 255) * cvt_post)
                err = old - new
                px[p] = new
                px[p + xp] = min(255, max(0, px[p + xp] + (err * 7 >> 4)))
                px[p + yp + xm] = min(255, max(0, px[p + yp + xm] +
                                               (err * 3 >> 4)))
                px[p + yp] = min(255, max(0, px[p + yp] + (err * 5 >> 4)))
                px[p + yp + xp] = min(255, max(0, px[p + yp + xp] +
                                               (err * 1 >> 4)))
                p += 1
    return np.array(px, np.uint8).reshape(h, w, 3)
