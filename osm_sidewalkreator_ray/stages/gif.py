"""GIF codec (GIF87a/89a) on numpy + stdlib only.

Closes the GIF plug point in ``stages/multimodal.py``: after BMP, PNG
and JPEG this is the remaining image format a web crawl actually
contains. Implements, from the public GIF89a specification:

- LZW decompression with variable code width (LSB-first bit packing,
  clear/EOI codes, the ``code == len(dict)`` cScSc case, 12-bit table
  cap with deferred-clear tolerance) and a real LZW compressor on the
  encode side (prefix-dict, synchronized width growth, table-full
  clear);
- global and local color tables, interlaced row order (the 8/8/4/2
  four-pass scheme), transparency via the Graphic Control Extension;
- multi-frame (animated) streams: ``decode_gif_frames`` composites
  each frame onto the logical screen honoring disposal methods
  0/1 (keep), 2 (restore background) and 3 (restore previous);
- ``encode_gif`` writes single- or multi-frame files from uint8 RGB
  arrays with an exact (<=256 distinct colors) global palette, so
  round-trips are LOSSLESS and testable byte-for-pixel.

No code from the reference repo (it contains no codecs).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit LZW table cap


# ------------------------------------------------------------- LZW

class _LsbBitWriter:
    """LSB-first bit packer (GIF's bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, width: int) -> None:
        self.acc |= (value & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """Pixel indices -> GIF LZW stream (without sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LsbBitWriter()
    width = min_code_size + 1
    bw.put(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for k in indices.astype(np.uint8).tobytes():
        kb = bytes([k])
        wk = w + kb
        if wk in table:
            w = wk
            continue
        bw.put(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # grow once the just-added code needs one more bit: the
            # NEXT emitted code may reference it (decoder mirrors by
            # growing when its table length reaches 1 << width)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = kb
    if w:
        bw.put(table[w], width)
    bw.put(eoi, width)
    return bw.flush()


def lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW stream -> pixel index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # tolerate missing EOI (common)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc case
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1


# ---------------------------------------------------------- encoder

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: np.ndarray | list[np.ndarray],
               delay_cs: int = 10, interlace: bool = False,
               disposal: int = 1,
               transparent_color: tuple | None = None) -> bytes:
    """uint8 (h, w, 3) RGB frame or list of same-size frames ->
    GIF89a bytes with one exact global palette over all frames
    (raises if the frames hold more than 256 distinct colors — this
    encoder never quantises, so decode round-trips losslessly).
    ``transparent_color`` marks one RGB as transparent in every
    frame's Graphic Control Extension."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.dtype != np.uint8 or f.shape != (h, w, 3):
            raise ValueError("frames must be uint8 (h, w, 3), same size")
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > 256; "
                         "quantise first")
    trans_idx = None
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        hits = np.nonzero((palette == tc).all(axis=1))[0]
        if len(hits) == 0:
            raise ValueError("transparent_color not present in frames")
        trans_idx = int(hits[0])
    # palette size: power of two >= max(2, len) (GIF requires 2^(n+1))
    n = max(1, int(len(palette) - 1).bit_length())
    size = 1 << n
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (size - len(palette)))
    min_code = max(2, n)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((n - 1) << 4) | (n - 1),
                       0, 0)
    out += pal_bytes
    if len(frames) > 1:
        # Netscape looping extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = inverse.reshape(len(frames), h * w)
    for fi in range(len(frames)):
        packed = (disposal & 7) << 2
        if trans_idx is not None:
            packed |= 1
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed, delay_cs,
                           trans_idx or 0, 0)
        idx = per_frame[fi].reshape(h, w)
        if interlace:
            order = _interlace_rows(h)
            idx = idx[order]
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        out.append(min_code)
        out += _sub_blocks(lzw_compress(idx.ravel(), min_code))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------- decoder

def _interlace_rows(h: int) -> np.ndarray:
    """Row order of the GIF 4-pass interlace: output row i of the
    stream belongs at canvas row order[i]."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def decode_gif_frames(payload: bytes
                      ) -> tuple[list[np.ndarray], list[int]]:
    """GIF bytes -> (list of uint8 (h, w, 3) RGB frames composited on
    the logical screen, list of per-frame delays in centiseconds)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * size,
                            pos).reshape(size, 3)
        pos += 3 * size
    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    trans_idx: int | None = None
    disposal = 0
    delay = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = payload[pos]
                gpacked, delay, tidx = struct.unpack_from(
                    "<BHB", payload, pos + 1)
                pos += 1 + sz
                disposal = (gpacked >> 2) & 7
                trans_idx = tidx if gpacked & 1 else None
            # skip (remaining) sub-blocks
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos)
            pos += 9
            if ipacked & 0x80:  # local color table
                size = 2 << (ipacked & 7)
                ct = np.frombuffer(payload, np.uint8, 3 * size,
                                   pos).reshape(size, 3)
                pos += 3 * size
            else:
                if gct is None:
                    raise ValueError("no color table for frame")
                ct = gct
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                lzw_decompress(b"".join(chunks), min_code),
                dtype=np.uint8)[:fw * fh]
            if len(idx) < fw * fh:
                raise ValueError("truncated GIF frame data")
            idx = idx.reshape(fh, fw)
            if ipacked & 0x40:  # interlaced: scatter rows back
                deinter = np.empty_like(idx)
                deinter[_interlace_rows(fh)] = idx
                idx = deinter
            prev_canvas = canvas.copy()
            region = canvas[top:top + fh, left:left + fw]
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            if trans_idx is not None:
                opaque = idx != trans_idx
                region[opaque] = rgb[opaque]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(int(delay))
            if disposal == 2:  # restore background
                canvas[top:top + fh, left:left + fw] = \
                    background[top:top + fh, left:left + fw]
            elif disposal == 3:  # restore previous
                canvas = prev_canvas
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("no image data in GIF payload")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first frame as uint8 (h, w, 3) RGB (the static-
    image contract the multimodal ImageDecoder expects)."""
    return decode_gif_frames(payload)[0][0]
