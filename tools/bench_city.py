"""Real-content benchmark: re-encode the reference's published city_cif
demo stream (352x288 x 300 frames @ 30fps) end to end and report encode
throughput, stream size and PSNR against the decoded source.

The reference's own stream for the same content is 2,051,899 bytes
(docs/demo/city_cif.gtm), giving a direct size comparison at the same
palette budget (64 palettes x 16 colors — the demo's own operating
point per its header tile/palette counts).
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

REF = '/root/reference/docs/demo/city_cif.gtm'


def main():
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder

    # optional: a different demo stream (e.g. football_cif.gtm)
    ref = next((a for a in sys.argv[1:] if a.endswith('.gtm')), REF)
    src = open(ref, 'rb').read()
    frames, _stream = decode_video(src)
    warm = '--warm' in sys.argv
    cfg = EncoderConfig(palette_count=64, tile_palette_size=16)
    if warm:
        Encoder(cfg).run_all(frames, fps=30.0, fast_lzma=True)
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    blob = enc.run_all(frames, fps=30.0, fast_lzma=True)
    dt = time.perf_counter() - t0

    dec, _ = decode_video(blob)
    mse = np.mean((dec.astype(np.float64) - frames.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0
    print(json.dumps({
        'metric': ('encode_'
                   + os.path.basename(ref).replace('.gtm', '')
                   + ('_warm' if warm else '')),
        'wall_s': round(dt, 1),
        'fps': round(len(frames) / dt, 3),
        'psnr': round(float(psnr), 3),
        'gtm_bytes': len(blob),
        'ref_gtm_bytes': len(src),
        'n_keyframes': enc.state.metrics.get('n_keyframes'),
        'ft_q_changed_frac': enc.state.metrics.get('ft_q_changed_frac'),
        'ft_pair_dedup': enc.state.metrics.get('ft_pair_dedup'),
        'step_times': {k: round(v, 1)
                       for k, v in enc.state.step_times.items()},
    }))


if __name__ == '__main__':
    main()
