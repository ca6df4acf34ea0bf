/* tiler_tpu GTM web player.
 *
 * Our own implementation of the GTM bitstream (container + command grammar
 * documented in tiler_tpu/bitstream/gtm.py; reference semantics defined by
 * /root/reference/main.pas:103-139 and decoders/htmljs/gtm.player.js) and
 * of the LZMA1 "alone" format (translated from this repo's own C++ decoder,
 * tiler_tpu/native/lzma1.cc — a fresh implementation of the public LZMA
 * spec, full lc 0..8 range).
 *
 * Plain ES5 on purpose: runs in any browser and under tools/minijs, which
 * conformance-tests this player against tiler_tpu.decode in CI.
 *
 * API:
 *   var p = new TilerGTM(uint8array);   // whole .gtm file
 *   p.decodeFrame() -> true|false       // advance one frame
 *   p.width, p.height, p.frameLengthMs, p.pixels (RGBA Uint8Array)
 *   tilerPlayFromURL(url, canvasId), tilerPlayFromFile(file, canvasId)
 *   tilerSetPlaying(bool)
 */
'use strict';

// ---------------------------------------------------------------------------
// LZMA1 alone-format decoder (one 13-byte-header stream per call)
// ---------------------------------------------------------------------------

var TilerLZMA = {};

(function () {
  var kTopValue = 1 << 24;
  var kBitModelTotal = 1 << 11;
  var kNumMoveBits = 5;
  var kMatchMinLen = 2;
  var kEndPosModelIndex = 14;
  var kNumFullDistances = 1 << (kEndPosModelIndex >> 1);
  var kNumAlignBits = 4;

  function newProbs(n) {
    var a = new Array(n);
    var i = n;
    while (i--) { a[i] = kBitModelTotal >> 1; }
    return a;
  }

  function RangeDecoder(buf, pos, size) {
    this.buf = buf;
    this.pos = pos;
    this.end = size;
    this.overrun = false;
    this.range = 4294967295;
    this.code = 0;
    this.next(); // first coded byte must be 0
    for (var i = 0; i < 4; i++) {
      this.code = ((this.code << 8) >>> 0) + this.next();
    }
  }

  RangeDecoder.prototype.next = function () {
    if (this.pos < this.end) { return this.buf[this.pos++]; }
    this.overrun = true;
    return 0;
  };

  RangeDecoder.prototype.normalize = function () {
    if (this.range < kTopValue) {
      this.range = (this.range * 256) % 4294967296;
      this.code = (this.code * 256 + this.next()) % 4294967296;
    }
  };

  RangeDecoder.prototype.decodeBit = function (probs, i) {
    var prob = probs[i];
    var bound = (this.range / 2048 | 0) * prob;
    var bit;
    if (this.code < bound) {
      this.range = bound;
      probs[i] = prob + ((kBitModelTotal - prob) >> kNumMoveBits);
      bit = 0;
    } else {
      this.range -= bound;
      this.code -= bound;
      probs[i] = prob - (prob >> kNumMoveBits);
      bit = 1;
    }
    this.normalize();
    return bit;
  };

  RangeDecoder.prototype.decodeDirectBits = function (n) {
    var res = 0;
    while (n--) {
      this.range = this.range / 2 | 0;
      var bit;
      if (this.code >= this.range) {
        this.code -= this.range;
        bit = 1;
      } else {
        bit = 0;
      }
      this.normalize();
      res = res * 2 + bit;
    }
    return res;
  };

  RangeDecoder.prototype.bitTreeDecode = function (probs, numBits, off) {
    var m = 1;
    for (var i = 0; i < numBits; i++) {
      m = (m << 1) | this.decodeBit(probs, off + m);
    }
    return m - (1 << numBits);
  };

  RangeDecoder.prototype.bitTreeReverseDecode = function (probs, numBits, off) {
    var m = 1, sym = 0;
    for (var i = 0; i < numBits; i++) {
      var bit = this.decodeBit(probs, off + m);
      m = (m << 1) | bit;
      sym |= bit << i;
    }
    return sym;
  };

  function LenDecoder() {
    this.choice = newProbs(2);
    this.low = newProbs(16 * 8);
    this.mid = newProbs(16 * 8);
    this.high = newProbs(256);
  }

  LenDecoder.prototype.decode = function (rc, posState) {
    if (!rc.decodeBit(this.choice, 0)) {
      return rc.bitTreeDecode(this.low, 3, posState * 8);
    }
    if (!rc.decodeBit(this.choice, 1)) {
      return 8 + rc.bitTreeDecode(this.mid, 3, posState * 8);
    }
    return 16 + rc.bitTreeDecode(this.high, 8, 0);
  };

  // Resumable alone-format decoder: decodeTo(target) decodes until the
  // output holds >= target bytes (or the stream ends) and can be called
  // again later — the incremental unpack of the reference player
  // (gtm.player.js:157-170 via js-lzma's decodeMaxSize, lzma.js:724), so
  // large keyframes decompress across frame ticks instead of in one
  // first-touch burst.
  function AloneDecoder(src, offset) {
    if (src.length - offset < 13) { throw new Error('lzma: short header'); }
    var props = src[offset];
    if (props >= 225) { throw new Error('lzma: bad props'); }
    this.lc = props % 9;
    props = props / 9 | 0;
    this.lp = props % 5;
    this.pb = props / 5 | 0;
    var sizeLo = src[offset + 5] + src[offset + 6] * 256 +
      src[offset + 7] * 65536 + src[offset + 8] * 16777216;
    var sizeHi = src[offset + 9] + src[offset + 10] * 256 +
      src[offset + 11] * 65536 + src[offset + 12] * 16777216;
    this.sizeKnown = !(sizeLo === 4294967295 && sizeHi === 4294967295);
    this.unpackSize = sizeLo + sizeHi * 4294967296;

    this.litProbs = newProbs(768 << (this.lc + this.lp));
    this.isMatch = newProbs(12 * 16);
    this.isRep = newProbs(12);
    this.isRepG0 = newProbs(12);
    this.isRepG1 = newProbs(12);
    this.isRepG2 = newProbs(12);
    this.isRep0Long = newProbs(12 * 16);
    this.posSlot = newProbs(4 * 64);
    this.specPos = newProbs(kNumFullDistances - kEndPosModelIndex);
    this.alignProbs = newProbs(1 << kNumAlignBits);
    this.lenDec = new LenDecoder();
    this.repLenDec = new LenDecoder();
    this.rc = new RangeDecoder(src, offset + 13, src.length);
    this.offset = offset;

    this.cap = 65536;
    this.out = new Uint8Array(this.cap);
    this.n = 0;
    this.state = 0;
    this.rep0 = 0; this.rep1 = 0; this.rep2 = 0; this.rep3 = 0;
    this.finished = false;
  }

  AloneDecoder.prototype.consumed = function () {
    return 13 + (this.rc.pos - (this.offset + 13));
  };

  AloneDecoder.prototype._grow = function (need) {
    while (this.cap < need) { this.cap *= 2; }
    var bigger = new Uint8Array(this.cap);
    bigger.set(this.out.slice(0, this.n), 0);
    this.out = bigger;
  };

  // Decode until the output holds >= target bytes (or end of stream).
  // Returns true when the stream is complete. One iteration can
  // overshoot target by one match length (<= 273 bytes).
  AloneDecoder.prototype.decodeTo = function (target) {
    if (this.finished) { return true; }
    var rc = this.rc;
    var lc = this.lc;
    var litProbs = this.litProbs, isMatch = this.isMatch,
      isRep = this.isRep, isRepG0 = this.isRepG0,
      isRepG1 = this.isRepG1, isRepG2 = this.isRepG2,
      isRep0Long = this.isRep0Long, posSlot = this.posSlot,
      specPos = this.specPos, alignProbs = this.alignProbs;
    var lenDec = this.lenDec, repLenDec = this.repLenDec;
    var sizeKnown = this.sizeKnown, unpackSize = this.unpackSize;
    var state = this.state, rep0 = this.rep0, rep1 = this.rep1,
      rep2 = this.rep2, rep3 = this.rep3;
    var n = this.n, out = this.out, cap = this.cap;
    var pbMask = (1 << this.pb) - 1;
    var lpMask = (1 << this.lp) - 1;
    var self = this;
    var done = false;

    function grow(need) {
      self.n = n;
      self._grow(need);
      out = self.out;
      cap = self.cap;
    }

    for (;;) {
      if (sizeKnown && n >= unpackSize) { done = true; break; }
      if (n >= target) { break; }
      if (rc.overrun) { throw new Error('lzma: truncated stream'); }

      var posState = n & pbMask;
      if (!rc.decodeBit(isMatch, state * 16 + posState)) {
        var prev = n === 0 ? 0 : out[n - 1];
        var litState = ((n & lpMask) << lc) + (prev >> (8 - lc));
        var base = 768 * litState;
        var symbol = 1;
        if (state >= 7) {
          var matchByte = out[n - rep0 - 1];
          do {
            var matchBit = (matchByte >> 7) & 1;
            matchByte = (matchByte << 1) & 255;
            var bit = rc.decodeBit(litProbs,
              base + ((1 + matchBit) << 8) + symbol);
            symbol = (symbol << 1) | bit;
            if (matchBit !== bit) { break; }
          } while (symbol < 256);
        }
        while (symbol < 256) {
          symbol = (symbol << 1) | rc.decodeBit(litProbs, base + symbol);
        }
        if (n + 1 > cap) { grow(n + 1); }
        out[n++] = symbol & 255;
        state = state < 4 ? 0 : (state < 10 ? state - 3 : state - 6);
        continue;
      }

      var len;
      if (rc.decodeBit(isRep, state)) {
        if (!rc.decodeBit(isRepG0, state)) {
          if (!rc.decodeBit(isRep0Long, state * 16 + posState)) {
            state = state < 7 ? 9 : 11;
            if (n + 1 > cap) { grow(n + 1); }
            out[n] = out[n - rep0 - 1];
            n++;
            continue;
          }
        } else {
          var dist;
          if (!rc.decodeBit(isRepG1, state)) {
            dist = rep1;
          } else if (!rc.decodeBit(isRepG2, state)) {
            dist = rep2;
            rep2 = rep1;
          } else {
            dist = rep3;
            rep3 = rep2;
            rep2 = rep1;
          }
          rep1 = rep0;
          rep0 = dist;
        }
        len = repLenDec.decode(rc, posState);
        state = state < 7 ? 8 : 11;
      } else {
        rep3 = rep2; rep2 = rep1; rep1 = rep0;
        len = lenDec.decode(rc, posState);
        state = state < 7 ? 7 : 10;
        var lenToPos = len < 4 ? len : 3;
        var slot = rc.bitTreeDecode(posSlot, 6, lenToPos * 64);
        if (slot < 4) {
          rep0 = slot;
        } else {
          var numDirect = (slot >> 1) - 1;
          var d = (2 | (slot & 1)) * Math.pow(2, numDirect);
          if (slot < kEndPosModelIndex) {
            d += rc.bitTreeReverseDecode(specPos, numDirect,
              d - slot - 1);
          } else {
            d += rc.decodeDirectBits(numDirect - kNumAlignBits) *
              (1 << kNumAlignBits);
            d += rc.bitTreeReverseDecode(alignProbs, kNumAlignBits, 0);
          }
          rep0 = d;
        }
        if (rep0 === 4294967295) { done = true; break; } // end-of-stream
      }
      len += kMatchMinLen;
      if (rep0 + 1 > n) { throw new Error('lzma: bad distance'); }
      if (n + len > cap) { grow(n + len); }
      var from = n - rep0 - 1;
      for (var i2 = 0; i2 < len; i2++) {
        out[n + i2] = out[from + i2];
      }
      n += len;
    }

    this.state = state;
    this.rep0 = rep0; this.rep1 = rep1;
    this.rep2 = rep2; this.rep3 = rep3;
    this.n = n;
    this.out = out;
    this.finished = done;
    return done;
  };

  TilerLZMA.AloneDecoder = AloneDecoder;

  // Decodes ONE alone-format stream starting at src[offset] in full.
  // Returns {out: Uint8Array, consumed: n} or throws.
  TilerLZMA.decodeAlone = function (src, offset) {
    var d = new AloneDecoder(src, offset);
    d.decodeTo(Infinity);
    return { out: d.out.slice(0, d.n), consumed: d.consumed() };
  };
})();

// ---------------------------------------------------------------------------
// GTM command-stream player
// ---------------------------------------------------------------------------

var GTM_CMD_BITS = 6;
var GTM_TILE_W = 8;

function TilerGTM(bytes) {
  this.src = bytes;           // whole file
  this.srcPos = 0;            // next undecoded compressed byte
  this.cmd = null;            // decoded command bytes (one keyframe chunk)
  this.cmdPos = 0;
  this.cmdLen = 0;            // decoded-so-far length within this.cmd
  this.dec = null;            // in-progress incremental AloneDecoder
  this.pending = [];          // decoded-but-unread chunks
  this.kfMaxBps = 0;          // header playback budget (0 = unthrottled)

  this.width = 0;
  this.height = 0;
  this.tmW = 0;
  this.tmH = 0;
  this.frameLengthMs = 40;
  this.tiles = null;          // Uint8Array tileCount*64
  this.tileCount = 0;
  this.palSize = 0;
  this.palettes = null;       // Uint8Array 256*palSize*4 (RGBA)
  this.pixels = null;         // RGBA Uint8Array width*height*4
  this.tmPos = 0;
  this.frameIndex = 0;
  this.looped = 0;

  // optional GTMv header (tiler_tpu/bitstream/gtm.py pack layout)
  if (bytes.length >= 40 && bytes[0] === 71 && bytes[1] === 84 &&
      bytes[2] === 77 && bytes[3] === 118) { // "GTMv"
    var dw = function (o) {
      return bytes[o] + bytes[o + 1] * 256 + bytes[o + 2] * 65536 +
        bytes[o + 3] * 16777216;
    };
    var whole = dw(8);
    this.headerWidth = dw(16);
    this.headerHeight = dw(20);
    this.kfCount = dw(24);
    this.frameCount = dw(28);
    this.kfMaxBps = dw(36);   // KFMaxBytesPerSec (main.pas:113 analogue)
    this.srcPos = whole;
  }
  this.startPos = this.srcPos;
}

// Per-tick decompression budget: the header's KFMaxBytesPerSec spread
// over one frame interval (the reference player's unpackData rate
// limit, gtm.player.js:157-170). 0 / headerless = decode whole chunks
// up front (legacy behavior).
TilerGTM.prototype._burst = function () {
  if (!this.kfMaxBps) { return Infinity; }
  return Math.max(65536,
    Math.ceil(this.kfMaxBps * this.frameLengthMs / 1000));
};

// Advance the in-progress incremental decode to >= target output bytes.
TilerGTM.prototype._pump = function (target) {
  if (this.dec === null) { return; }
  var done = this.dec.decodeTo(target);
  this.cmd = this.dec.out;
  this.cmdLen = this.dec.n;
  if (done) {
    this.srcPos += this.dec.consumed();
    this.dec = null;
  }
};

TilerGTM.prototype._moreCommands = function () {
  if (this.srcPos >= this.src.length) { return false; }
  this.dec = new TilerLZMA.AloneDecoder(this.src, this.srcPos);
  this.cmdPos = 0;
  this.cmd = this.dec.out;
  this.cmdLen = 0;
  this._pump(this._burst());
  return true;
};

// Make nbytes available at cmdPos, decoding on demand (past the rate
// budget if the current frame genuinely needs the bytes now).
TilerGTM.prototype._need = function (nbytes) {
  if (this.cmdPos + nbytes > this.cmdLen && this.dec !== null) {
    this._pump(this.cmdPos + nbytes);
  }
  if (this.cmdPos + nbytes > this.cmdLen) {
    throw new Error('gtm: truncated command payload');
  }
};

TilerGTM.prototype._ensure = function (nbytes) {
  if (this.cmd !== null && this.cmdPos + nbytes > this.cmdLen &&
      this.dec !== null) {
    this._pump(this.cmdPos + nbytes);
  }
  if (this.cmd === null || this.cmdPos + nbytes > this.cmdLen) {
    // command words never straddle keyframe chunks (each chunk is a whole
    // keyframe's stream)
    if (this.cmd !== null && this.cmdPos < this.cmdLen) {
      throw new Error('gtm: command straddles chunk boundary');
    }
    if (!this._moreCommands()) { return false; }
    return this._ensure(nbytes);
  }
  return true;
};

TilerGTM.prototype._word = function () {
  var v = this.cmd[this.cmdPos] + this.cmd[this.cmdPos + 1] * 256;
  this.cmdPos += 2;
  return v;
};

TilerGTM.prototype._dword = function () {
  return this._word() + this._word() * 65536;
};

TilerGTM.prototype._redim = function () {
  this.width = this.tmW * GTM_TILE_W;
  this.height = this.tmH * GTM_TILE_W;
  var np = this.width * this.height * 4;
  if (this.pixels === null || this.pixels.length !== np) {
    this.pixels = new Uint8Array(np);
    var i = 3;
    while (i < np) { this.pixels[i] = 255; i += 4; }
  }
};

TilerGTM.prototype._blit = function (tileIdx, attrs) {
  var palIdx = attrs >> 2;
  var hMir = attrs & 1;
  var vMir = attrs & 2;
  var tOff = tileIdx * 64;
  var pOff = palIdx * this.palSize * 4;
  var cellX = (this.tmPos % this.tmW) * GTM_TILE_W;
  var cellY = (this.tmPos / this.tmW | 0) * GTM_TILE_W;
  var stride = this.width * 4;
  var tiles = this.tiles;
  var pal = this.palettes;
  var px = this.pixels;
  for (var ty = 0; ty < GTM_TILE_W; ty++) {
    var sy = vMir ? (GTM_TILE_W - 1 - ty) : ty;
    var row = (cellY + ty) * stride + cellX * 4;
    for (var tx = 0; tx < GTM_TILE_W; tx++) {
      var sx = hMir ? (GTM_TILE_W - 1 - tx) : tx;
      var v = tiles[tOff + sy * GTM_TILE_W + sx];
      var p = pOff + v * 4;
      px[row] = pal[p];
      px[row + 1] = pal[p + 1];
      px[row + 2] = pal[p + 2];
      px[row + 3] = pal[p + 3];
      row += 4;
    }
  }
  this.tmPos++;
};

// Advance one frame. Returns true if a frame was completed.
TilerGTM.prototype.decodeFrame = function () {
  for (;;) {
    if (!this._ensure(2)) {
      // input exhausted: loop
      if (this.frameIndex > 0) {
        this.srcPos = this.startPos;
        this.cmd = null;
        this.cmdLen = 0;
        this.dec = null;
        this.looped++;
        if (!this._ensure(2)) { return false; }
      } else {
        return false;
      }
    }
    var w = this._word();
    var cmd = w & ((1 << GTM_CMD_BITS) - 1);
    var attrs = w >> GTM_CMD_BITS;

    if (cmd === 30) {          // SetDimensions
      this._need(12);
      this.tmW = this._word();
      this.tmH = this._word();
      this.frameLengthMs = Math.round(this._dword() / 1000000);
      this.tileCount = this._dword();
      if (this.tiles === null || this.tiles.length < this.tileCount * 64) {
        var grown = new Uint8Array(this.tileCount * 64);
        if (this.tiles !== null) { grown.set(this.tiles, 0); }
        this.tiles = grown;
      }
      this._redim();
    } else if (cmd === 29) {   // TileSet
      this._need(8);
      var tstart = this._dword();
      var tend = this._dword();
      this.palSize = attrs;
      if (this.palettes === null ||
          this.palettes.length !== 256 * this.palSize * 4) {
        this.palettes = new Uint8Array(256 * this.palSize * 4);
      }
      var cnt = (tend - tstart + 1) * 64;
      this._need(cnt);
      if ((tend + 1) * 64 > this.tiles.length) {
        var g2 = new Uint8Array((tend + 1) * 64);
        g2.set(this.tiles, 0);
        this.tiles = g2;
      }
      this.tiles.set(this.cmd.slice(this.cmdPos, this.cmdPos + cnt),
        tstart * 64);
      this.cmdPos += cnt;
    } else if (cmd === 3) {    // LoadPalette
      this._need(2 + this.palSize * 4);
      var palIdx = this.cmd[this.cmdPos];
      this.cmdPos += 2;        // + palette format byte (0 = RGBA32)
      var dst = palIdx * this.palSize * 4;
      var nb = this.palSize * 4;
      this.palettes.set(this.cmd.slice(this.cmdPos, this.cmdPos + nb), dst);
      this.cmdPos += nb;
    } else if (cmd === 0) {    // SkipBlock
      this.tmPos += attrs + 1;
    } else if (cmd === 1) {    // ShortTileIdx
      this._need(2);
      this._blit(this._word(), attrs);
    } else if (cmd === 2) {    // LongTileIdx
      this._need(4);
      this._blit(this._dword(), attrs);
    } else if (cmd === 28) {   // FrameEnd
      if (this.tmPos !== this.tmW * this.tmH) {
        throw new Error('gtm: incomplete tilemap ' + this.tmPos);
      }
      this.tmPos = 0;
      this.frameIndex++;
      // rate-limited read-ahead for the rest of this keyframe's chunk
      // (the reference's per-tick unpackData); on-demand _need calls
      // cover any shortfall, so this only smooths the work
      if (this.dec !== null) {
        this._pump(this.cmdLen + this._burst());
      }
      return true;
    } else {
      throw new Error('gtm: unknown command ' + cmd);
    }
  }
};

// ---------------------------------------------------------------------------
// Canvas glue
// ---------------------------------------------------------------------------

var _tilerPlayer = null;
var _tilerPlaying = true;
var _tilerTimer = null;

function tilerSetPlaying(playing) {
  _tilerPlaying = playing;
}

function _tilerTick(canvasId) {
  if (_tilerPlayer === null || !_tilerPlaying) { return; }
  if (_tilerPlayer.decodeFrame()) {
    var canvas = document.getElementById(canvasId);
    if (canvas.width !== _tilerPlayer.width ||
        canvas.height !== _tilerPlayer.height) {
      canvas.width = _tilerPlayer.width;
      canvas.height = _tilerPlayer.height;
    }
    var ctx = canvas.getContext('2d');
    var img = ctx.getImageData(0, 0, canvas.width, canvas.height);
    img.data.set(_tilerPlayer.pixels, 0);
    ctx.putImageData(img, 0, 0);
  }
}

function _tilerStart(bytes, canvasId) {
  _tilerPlayer = new TilerGTM(bytes);
  if (_tilerTimer !== null) { clearInterval(_tilerTimer); }
  _tilerTick(canvasId); // first frame (also discovers frame length)
  _tilerTimer = setInterval(function () { _tilerTick(canvasId); },
    _tilerPlayer.frameLengthMs);
}

function tilerPlayFromURL(url, canvasId) {
  var req = new XMLHttpRequest();
  req.open('GET', url, true);
  req.responseType = 'arraybuffer';
  req.onload = function () {
    _tilerStart(new Uint8Array(req.response), canvasId);
  };
  req.send(null);
}

function tilerPlayFromFile(file, canvasId) {
  var reader = new FileReader();
  reader.onload = function () {
    _tilerStart(new Uint8Array(reader.result), canvasId);
  };
  reader.readAsArrayBuffer(file);
}
