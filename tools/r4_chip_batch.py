"""Round-4 chip measurement batch — ONE process (each new process
re-enters the tunnel's first-op stall lottery; see docs/RESULTS.md).

Phases, in order (each prints one JSON line tagged 'phase'):
  warmup      — compile every kernel at the 1080p + CIF shape buckets
  bench1080   — 3 timed 1080p x 16 encodes (median protocol) with the
                round-4 dispatch counters
  city        — full 300-frame city_cif re-encode (the VERDICT item-1
                reproducibility target)
  football    — full football_cif re-encode (RD sweep anchor)
  rd_sweep    — bytes-vs-PSNR at 3 quality points per demo clip (the
                honesty item: the size comparison as a curve)
  nn_ab       — fused whole-keyframe assign: Pallas kernel vs XLA scan
                at the 1080p shapes (VERDICT item 3)

Run:  stdbuf -oL python tools/r4_chip_batch.py [phase ...] 2>&1 | tee log
With phase args, only those phases run (warmup always runs first).
Between encodes every state/device reference drops and gc runs — a held
previous-encode state (frames + source tiles on device) plus HBM
fragmentation OOMed the first rd_sweep attempt on the real chip.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def encode(frames, fps, cfg, fast=True):
    """Encode and return (wall_s, blob, metrics+step_times snapshot) —
    no live state/device references escape."""
    from tiler_tpu.pipeline.encoder import Encoder
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    blob = enc.run_all(frames, fps=fps, fast_lzma=fast)
    dt = time.perf_counter() - t0
    snap = dict(enc.state.metrics)
    snap['step_times'] = {k: round(v, 2)
                          for k, v in enc.state.step_times.items()}
    del enc
    gc.collect()
    return dt, blob, snap


def psnr_vs(dec, src):
    mse = np.mean((dec.astype(np.float64) - src.astype(np.float64)) ** 2)
    return round(float(10 * np.log10(255.0 ** 2 / mse)), 3) if mse else 99.0


def disp_total(snap):
    d = snap.get('dispatches') or {}
    return sum(v.get('total', 0) for v in d.values())


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video

    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    t_start = time.perf_counter()
    cfg1080 = EncoderConfig(palette_count=128, tile_palette_size=16)
    cfg_cif = EncoderConfig(palette_count=64, tile_palette_size=16)
    frames1080 = synthetic_clip(16, 1080, 1920)

    city = open('/root/reference/docs/demo/city_cif.gtm', 'rb').read()
    city_frames, _ = decode_video(city)
    fb = open('/root/reference/docs/demo/football_cif.gtm', 'rb').read()
    fb_frames, _ = decode_video(fb)

    # warmup (1080p shapes + CIF shapes off a prefix)
    t0 = time.perf_counter()
    if on('bench1080') or on('nn_ab'):
        encode(frames1080, 24.0, cfg1080)
    if on('city') or on('football') or on('rd_sweep'):
        # FULL-clip warm: a prefix warms different pow2 shape buckets
        # and the measured run then pays the XLA compiles (bench.py
        # real_content_entry learned the same lesson)
        encode(city_frames, 30.0, cfg_cif)
    log(phase='warmup', wall_s=round(time.perf_counter() - t0, 1))

    if on('bench1080'):
        runs = []
        blob = b''
        for i in range(3):
            dt, blob, snap = encode(frames1080, 24.0, cfg1080)
            runs.append(round(16 / dt, 3))
            log(phase='bench1080', run=i, wall_s=round(dt, 2),
                fps=round(16 / dt, 3), n_dispatches=disp_total(snap),
                dispatches=snap.get('dispatches'),
                step_times=snap['step_times'],
                ft_phases=snap.get('ft_phases'),
                dither_phases=snap.get('dither_phases'),
                gt_phases=snap.get('gt_phases'))
        log(phase='bench1080_median', fps=float(np.median(runs)),
            runs=runs, gtm_bytes=len(blob),
            psnr=psnr_vs(decode_video(blob)[0], frames1080))

    for name, ref, fr in (('city', city, city_frames),
                          ('football', fb, fb_frames)):
        if not on(name):
            continue
        dt, blob, snap = encode(fr, 30.0, cfg_cif)
        dec, _ = decode_video(blob)
        log(phase=name, wall_s=round(dt, 2), fps=round(len(fr) / dt, 3),
            gtm_bytes=len(blob), ref_gtm_bytes=len(ref),
            psnr=psnr_vs(dec, fr), n_dispatches=disp_total(snap),
            dispatches=snap.get('dispatches'),
            step_times=snap['step_times'],
            ft_phases=snap.get('ft_phases'),
            dither_phases=snap.get('dither_phases'),
            gt_phases=snap.get('gt_phases'),
            ft_q_changed_frac=snap.get('ft_q_changed_frac'))
        del dec, blob
        gc.collect()

    if on('rd_sweep'):
        # quality via the tile budget knob (qb_tiles) at the demos' own
        # palette budget — bytes vs PSNR as a curve
        for name, fr in (('city', city_frames), ('football', fb_frames)):
            for qb in (1.0, 2.0, 3.0):
                cfg = EncoderConfig(palette_count=64, tile_palette_size=16,
                                    qb_tiles=qb)
                try:
                    dt, blob, snap = encode(fr, 30.0, cfg)
                except Exception as e:  # noqa: BLE001 — log + continue
                    log(phase='rd_sweep', clip=name, qb_tiles=qb,
                        error=repr(e)[:200])
                    gc.collect()
                    continue
                dec, _ = decode_video(blob)
                log(phase='rd_sweep', clip=name, qb_tiles=qb,
                    gtm_bytes=len(blob), psnr=psnr_vs(dec, fr),
                    wall_s=round(dt, 1))
                del dec, blob
                gc.collect()

    if on('nn_ab'):
        for label, env in (('pallas', None), ('scan', '1')):
            if env is None:
                os.environ.pop('TILER_NO_PALLAS', None)
            else:
                os.environ['TILER_NO_PALLAS'] = env
            encode(frames1080, 24.0, cfg1080)  # warm this path
            dt, _, snap = encode(frames1080, 24.0, cfg1080)
            log(phase='nn_ab', path=label, wall_s=round(dt, 2),
                assign_s=(snap.get('ft_phases') or {}).get('assign'))
        os.environ.pop('TILER_NO_PALLAS', None)

    log(phase='done', total_wall_s=round(time.perf_counter() - t_start, 1))


if __name__ == '__main__':
    main()
