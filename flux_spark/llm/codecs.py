"""Pure-bytes media codecs built on the Python standard library.

The container ships no PIL/soundfile/cv2 (probed every round — see
SCALE.md), but real codecs for two ubiquitous container formats need
nothing beyond the stdlib:

* **WAV (RIFF/WAVE PCM)** — parsed/written with the stdlib ``wave``
  module: real RIFF chunk traversal, real PCM frames.
* **PNG** — hand-rolled on ``zlib`` + ``struct``: real signature/chunk
  parsing (IHDR/IDAT/IEND with CRC validation), real DEFLATE inflate,
  and all five scanline filters (None/Sub/Up/Average/Paeth) for
  non-interlaced 8-bit gray/RGB/RGBA — i.e. any PNG a normal encoder
  emits at those color types decodes here.

These are the per-payload functions the Arrow ``mapInPandas`` plumbing in
:mod:`multimodal` batches over; they are deliberately Spark-free so they
unit-test in microseconds. JPEG/MP4 decode remains stubbed in
``multimodal.py`` — those genuinely need external codec libraries.

Synthesis counterparts (:func:`synth_wav_bytes`, :func:`synth_png_bytes`)
generate REAL files from a deterministic formula of an integer seed, so
the DuckDB oracle can recompute the decoded statistics symbolically: if
either the encoder or the decoder corrupted a single byte, the stats (or
the CRC/consistency checks) would diverge and the gate would fail.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

# ---------------------------------------------------------------------------
# WAV — stdlib `wave` on real RIFF bytes
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def synth_wav_frames(seed: int) -> int:
    """Frame count for the deterministic synthetic WAV of ``seed``."""
    return 64 + seed % 64


def synth_wav_sample(seed: int, k: int) -> int:
    """Sample k of the deterministic synthetic WAV: a full-range PCM16
    value from a fixed mixing formula (SQL twin lives in the oracle)."""
    return (seed * 31 + k * 17) % 65536 - 32768


def synth_wav_bytes(seed: int) -> bytes:
    """A real mono PCM16 RIFF/WAVE file, 8 kHz, frames/samples from the
    formulas above — playable by any audio tool."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        n = synth_wav_frames(seed)
        w.writeframes(
            b"".join(
                struct.pack("<h", synth_wav_sample(seed, k)) for k in range(n)
            )
        )
    return buf.getvalue()


def decode_wav_bytes(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload: container metadata + PCM16 sample stats.

    Returns dict(sample_rate, n_channels, n_frames, duration_ms,
    abs_sum) where ``abs_sum`` is the sum of absolute PCM16 sample values
    across all channels — a stat the oracle can recompute symbolically.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, nfr = w.getframerate(), w.getnchannels(), w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError(f"only PCM16 supported, got width {w.getsampwidth()}")
        raw = w.readframes(nfr)
    samples = struct.unpack(f"<{nfr * nch}h", raw)
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_frames": nfr,
        "duration_ms": nfr * 1000 // rate,
        "abs_sum": sum(abs(s) for s in samples),
    }


# ---------------------------------------------------------------------------
# PNG — zlib/struct, full chunk + filter handling
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def synth_png_dims(seed: int) -> tuple[int, int]:
    return 4 + seed % 5, 3 + seed % 4  # (width, height)


def synth_png_pixel(seed: int, i: int) -> int:
    """Byte i (row-major, channel-interleaved RGB) of the synthetic image."""
    return (seed * 7 + i) % 256


def synth_png_bytes(seed: int) -> bytes:
    """A real 8-bit RGB PNG (filter 0 scanlines, one IDAT) with pixel
    bytes from :func:`synth_png_pixel` — opens in any image viewer."""
    w, h = synth_png_dims(seed)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = []
    for y in range(h):
        base = y * w * 3
        rows.append(
            b"\x00" + bytes(synth_png_pixel(seed, base + x) for x in range(w * 3))
        )
    idat = zlib.compress(b"".join(rows))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG: signature, chunk walk with CRC validation, IDAT
    inflate, and scanline un-filtering (all five standard filters).
    Supports non-interlaced 8-bit gray/gray+alpha/RGB/RGBA.

    Returns (width, height, channels, pixel_bytes) with samples
    interleaved row-major.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match dimensions")
    prev = bytes(stride)
    out = bytearray()
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out.extend(line)
        prev = bytes(line)
    return w, h, ch, bytes(out)


def decode_png_bytes(payload: bytes) -> dict:
    """Decoded-image statistics: dict(width, height, channels, pixel_sum)
    where ``pixel_sum`` sums every reconstructed sample byte (the stat
    the DuckDB oracle recomputes symbolically for synthetic payloads)."""
    w, h, ch, pixels = png_pixels(payload)
    return {"width": w, "height": h, "channels": ch, "pixel_sum": sum(pixels)}


def resize_nearest(
    pixels: bytes, w: int, h: int, ch: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of an interleaved 8-bit pixel buffer."""
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = y * h // new_h
        for x in range(new_w):
            sx = x * w // new_w
            src = (sy * w + sx) * ch
            dst = (y * new_w + x) * ch
            out[dst : dst + ch] = pixels[src : src + ch]
    return bytes(out)
