"""Measure the auto-lzma rate-distortion curve: encode every sweep
point (qb_tiles 1.0/2.0/3.0, both demo clips — qb 2.0 re-measures the
r4s2_chip_batch point so the whole curve comes from one protocol) with
the fast compressor on the chip, then recompress each stream to
`--lzma-mode auto` full-effort ON THE HOST (`transcode` semantics:
identical commands, exact auto bytes — no second chip encode needed).

Appends JSONL to docs/r4_batch_run2.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'r4_batch_run2.jsonl')


def emit(rec):
    with open(OUT, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec), flush=True)


def auto_bytes(blob: bytes) -> int:
    """Exact `transcode --lzma-mode auto` output size for a stream."""
    from tiler_tpu.bitstream.gtm import transcode_gtm
    return len(transcode_gtm(blob, lzma_mode='auto'))


def main():
    import numpy as np

    from tiler_tpu.config import EncoderConfig
    from tiler_tpu.decode import decode_video
    from tiler_tpu.pipeline.encoder import Encoder

    for clip in ('city', 'football'):
        path = f'/root/reference/docs/demo/{clip}_cif.gtm'
        src = open(path, 'rb').read()
        frames, _ = decode_video(src)
        for qb in (1.0, 2.0, 3.0):
            cfg = EncoderConfig(palette_count=64, tile_palette_size=16,
                                qb_tiles=qb)
            t0 = time.perf_counter()
            blob = Encoder(cfg).run_all(frames, fps=30.0, fast_lzma=True)
            wall = time.perf_counter() - t0
            dec, _ = decode_video(blob)
            mse = np.mean((dec.astype(np.float64)
                           - frames.astype(np.float64)) ** 2)
            t0 = time.perf_counter()
            nb = auto_bytes(blob)
            emit({'phase': 'rd_auto', 'clip': clip, 'qb_tiles': qb,
                  'fast_bytes': len(blob), 'auto_bytes': nb,
                  'ref_bytes': len(src),
                  'auto_vs_ref_pct': round(
                      100.0 * (nb - len(src)) / len(src), 2),
                  'psnr': round(
                      float(10 * np.log10(255.0 ** 2 / mse)), 3)
                  if mse else 99.0,
                  'encode_s': round(wall, 1),
                  'recompress_s': round(time.perf_counter() - t0, 1)})


if __name__ == '__main__':
    main()
