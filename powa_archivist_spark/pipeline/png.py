"""Pure-Python PNG codec (stdlib ``zlib`` only) — the real decoder
behind the multimodal seam (VERDICT r6 task 6).

The container has no image libraries, but PNG needs none: the format is
zlib-compressed scanlines plus five byte-local filters (RFC 2083).  This
module gives the multimodal operators an actual pixel path in ANY
environment; :func:`probe_codec` still prefers PIL when importable (it
covers jpeg/webp), and non-PNG payloads without PIL keep the honest
NotImplementedError.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the shapes produced by every mainstream
encoder's default path.  Paletted (3) and 16-bit images raise.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(payload: bytes) -> bool:
    return bool(payload) and payload[:8] == PNG_MAGIC


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, channels, raw pixel bytes row-major)."""
    if not is_png(payload):
        raise PngError("not a PNG payload")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace:
                raise PngError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise PngError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError("scanline size mismatch")
    out = bytearray(stride * height)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1:pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if ftype == 0:  # None
            out[off:off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                up = out[prev_off + off + i] if y else 0
                ul = out[prev_off + off + i - channels] if (y and i >= channels) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter {ftype}")
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal encoder (filter 0 rows) — fixture generation + the
    resize round-trip.  ``pixels`` is row-major, ``width*channels``
    bytes per row."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer size mismatch")
    scan = bytearray()
    for y in range(height):
        scan.append(0)
        scan.extend(pixels[y * stride:(y + 1) * stride])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes,
    out_w: int, out_h: int,
) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer."""
    if width <= 0 or height <= 0 or out_w <= 0 or out_h <= 0:
        raise PngError("invalid dimensions")
    stride = width * channels
    out = bytearray(out_w * out_h * channels)
    o = 0
    for y in range(out_h):
        sy = (y * height) // out_h
        row = sy * stride
        for x in range(out_w):
            sx = ((x * width) // out_w) * channels
            out[o:o + channels] = pixels[row + sx:row + sx + channels]
            o += channels
    return bytes(out)
