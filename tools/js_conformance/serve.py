"""Serve the conformance staging dir for the browser harness.

Usage:
  python tools/js_conformance/gen_streams.py /tmp/gtm_conformance
  python tools/js_conformance/serve.py /tmp/gtm_conformance [port]
Then open http://127.0.0.1:<port>/harness.html and read window.RESULT.
"""
from __future__ import annotations

import functools
import http.server
import sys


def main():
    directory = sys.argv[1] if len(sys.argv) > 1 else '/tmp/gtm_conformance'
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8777
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=directory)
    with http.server.ThreadingHTTPServer(('127.0.0.1', port), handler) as srv:
        print(f'serving {directory} at http://127.0.0.1:{port}/harness.html',
              flush=True)
        srv.serve_forever()


if __name__ == '__main__':
    main()
