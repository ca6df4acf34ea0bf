"""LZMA parse-quality calibration: greedy vs optimal (native, lc8) vs
liblzma optimal-parse lc3 (preset 9e) on the reference's own command
payloads — the data behind docs/RESULTS.md's "LZMA keyframe-stream
compression" tables.

The reference pipeline shells out to `lzma.exe e -lc8 -eos`
(/root/reference/extern.pas:224), an optimal-parse encoder; its published
city_cif.gtm is therefore the ground-truth target for byte-parity of the
compression layer.

Usage: python tools/lzma_parse_bench.py [/path/to/stream.gtm ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tiler_tpu.bitstream.lzma_codec import (iter_lzma_streams,  # noqa: E402
                                            lzma_compress_alone)
from tiler_tpu.native import lzma_encode_alone  # noqa: E402


def calibrate(path: str) -> None:
    raw = open(path, 'rb').read()
    body = raw
    if raw[:4] == b'GTMv':
        from tiler_tpu.bitstream.gtm import GTMHeader
        body = raw[GTMHeader.unpack(raw).whole_header_size:]
    parts = list(iter_lzma_streams(body))
    print(f'{path}: {len(parts)} keyframe streams, '
          f'raw total {sum(len(p) for p in parts):,} B, '
          f'file {len(raw):,} B')
    tot = {'greedy8': 0, 'opt8': 0, 'liblzma3': 0}
    t_opt = 0.0
    for i, p in enumerate(parts):
        g = len(lzma_encode_alone(p, optimal=False))
        t0 = time.time()
        o = len(lzma_encode_alone(p, optimal=True))
        t_opt += time.time() - t0
        l3 = len(lzma_compress_alone(p))
        tot['greedy8'] += g
        tot['opt8'] += o
        tot['liblzma3'] += l3
        print(f'  kf{i}: raw={len(p):9,}  greedy8={g:9,}  opt8={o:9,}  '
              f'liblzma3={l3:9,}')
    print(f'  total: greedy8={tot["greedy8"]:,}  opt8={tot["opt8"]:,}  '
          f'liblzma3={tot["liblzma3"]:,}  '
          f'(opt parse time {t_opt:.1f}s, '
          f'{sum(len(p) for p in parts) / max(t_opt, 1e-9) / 1e6:.1f} MB/s)')


def main():
    paths = sys.argv[1:] or ['/root/reference/docs/demo/city_cif.gtm',
                             '/root/reference/docs/demo/football_cif.gtm']
    for p in paths:
        try:
            calibrate(p)
        except FileNotFoundError:
            print(f'{p}: not found, skipped')


if __name__ == '__main__':
    main()
