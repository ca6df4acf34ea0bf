"""Browser-host shims for the mini-JS engine: document/canvas/ImageData,
timers, console — just enough DOM for gtm.player.js to run headless.

The canvas 2D context implements fillRect/getImageData/putImageData with a
real RGBA backing store (ImageData.data is a Uint8ClampedArray-equivalent
TypedArray), because the player reads its working ImageData from the
canvas after painting it black (gtm.player.js:141-155) and putImageData's
the previous frame each tick."""
from __future__ import annotations

import numpy as np

from .engine import (ArrayBuffer, Interpreter, JSObject, NativeFunction,
                     TypedArray, js_to_string, js_tonumber, undefined)


def _num(v):
    return js_tonumber(v)


class BrowserHost:
    """Installs document/console/timers into an Interpreter and keeps the
    canvas state reachable from Python."""

    def __init__(self, interp: Interpreter, log=None):
        self.interp = interp
        self.log = log if log is not None else (lambda *a: None)
        self.timers = []          # (id, fn, ms, repeating)
        self._timer_id = 1
        self.canvases = {}
        self._install()

    # -- canvas -------------------------------------------------------------

    def _make_context(self, canvas: JSObject) -> JSObject:
        ctx = JSObject()
        ctx.props['fillStyle'] = 'black'

        def ensure(c):
            # the player assigns .width/.height then paints; a real canvas
            # reallocates its bitmap on that assignment -- emulate lazily
            w = int(_num(c.props.get('width', 8.0)))
            h = int(_num(c.props.get('height', 8.0)))
            if len(c.props['_pixels'].data) != w * h * 4:
                c.props['_pixels'] = TypedArray(bytearray(w * h * 4),
                                                clamped=True)
            return w, h

        def fill_rect(this, args):
            ensure(canvas)
            buf = canvas.props['_pixels']
            # only black fills occur (gtm.player.js:150-151)
            view = np.frombuffer(buf.data, np.uint8).reshape(-1, 4)
            view[:, :3] = 0
            view[:, 3] = 255
            return undefined

        def get_image_data(this, args):
            ensure(canvas)
            x, y, w, h = (int(_num(a)) for a in args[:4])
            img = JSObject()
            img.props['width'] = float(w)
            img.props['height'] = float(h)
            img.props['data'] = TypedArray(
                bytearray(canvas.props['_pixels'].data), clamped=True)
            return img

        def put_image_data(this, args):
            ensure(canvas)
            img = args[0]
            canvas.props['_last_put'] = img
            data = img.get('data')
            canvas.props['_pixels'] = TypedArray(bytearray(data.data),
                                                 clamped=True)
            return undefined

        ctx.props['fillRect'] = NativeFunction('fillRect', fill_rect)
        ctx.props['getImageData'] = NativeFunction('getImageData',
                                                   get_image_data)
        ctx.props['putImageData'] = NativeFunction('putImageData',
                                                   put_image_data)
        return ctx

    def _make_canvas(self, cid: str) -> JSObject:
        canvas = JSObject()
        canvas.props['id'] = cid
        canvas.props['_pixels'] = TypedArray(bytearray(8 * 8 * 4),
                                             clamped=True)
        ctx_box = {}

        def get_context(this, args):
            if 'ctx' not in ctx_box:
                ctx_box['ctx'] = self._make_context(canvas)
            return ctx_box['ctx']

        canvas.props['getContext'] = NativeFunction('getContext', get_context)
        canvas.props['width'] = 8.0
        canvas.props['height'] = 8.0
        self.canvases[cid] = canvas
        return canvas

    # -- install ------------------------------------------------------------

    def _install(self):
        it = self.interp
        g = it.globals

        document = JSObject()

        def get_element_by_id(this, args):
            cid = js_to_string(args[0])
            if cid not in self.canvases:
                self._make_canvas(cid)
            return self.canvases[cid]
        document.props['getElementById'] = NativeFunction(
            'getElementById', get_element_by_id)
        g['document'] = document

        console = JSObject()
        console.props['log'] = NativeFunction(
            'log', lambda t, a: self.log(*[js_to_string(x) for x in a]))
        console.props['error'] = NativeFunction(
            'error', lambda t, a: self.log('ERROR:',
                                           *[js_to_string(x) for x in a]))
        g['console'] = console

        def set_timeout(this, args):
            self.timers.append((self._timer_id, args[0],
                                _num(args[1]) if len(args) > 1 else 0.0,
                                False))
            self._timer_id += 1
            return float(self._timer_id - 1)

        def set_interval(this, args):
            self.timers.append((self._timer_id, args[0],
                                _num(args[1]) if len(args) > 1 else 0.0,
                                True))
            self._timer_id += 1
            return float(self._timer_id - 1)

        g['setTimeout'] = NativeFunction('setTimeout', set_timeout)
        g['setInterval'] = NativeFunction('setInterval', set_interval)
        g['clearInterval'] = NativeFunction('clearInterval',
                                            lambda t, a: undefined)
        g['window'] = JSObject()

    # -- helpers for drivers -------------------------------------------------

    def canvas_pixels(self, cid: str) -> np.ndarray:
        """Current canvas RGBA as [h, w, 4] uint8 (what putImageData drew)."""
        c = self.canvases[cid]
        w = int(_num(c.props['width']))
        h = int(_num(c.props['height']))
        return np.frombuffer(c.props['_pixels'].data, np.uint8) \
            .reshape(h, w, 4).copy()


def imagedata_rgba(img: JSObject) -> np.ndarray:
    """ImageData -> [h, w, 4] uint8 view copy."""
    w = int(_num(img.get('width')))
    h = int(_num(img.get('height')))
    return np.frombuffer(img.get('data').data, np.uint8) \
        .reshape(h, w, 4).copy()
