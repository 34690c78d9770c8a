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

* **MP4 / ISO-BMFF (container level)** — a real box writer + sample-table
  parser (``struct`` only): ftyp/moov/trak traversal, stts timestamp
  expansion, stsc chunk-run walk against absolute stco offsets. Frame
  SAMPLING is a container operation, so this makes
  ``multimodal.sample_frames`` a real operator; only decoding the codec
  payload itself (H.264 etc.) would need an external library.

* **JPEG (baseline sequential DCT)** — a real encoder + decoder on
  ``struct`` + numpy (r8, the last previously library-blocked format):
  marker walk, DQT/DHT as found in the file, canonical Huffman
  entropy coding with byte stuffing and restart intervals, dequantize +
  float IDCT, grayscale and 4:4:4 YCbCr color, plus (r9) subsampled
  4:2:0/4:2:2/4:4:0 via the T.81 interleaved-MCU walk + replication
  upsampling. Progressive/arithmetic streams raise ValueError
  (quarantine) rather than guess.

These are the per-payload functions the Arrow ``mapInPandas`` plumbing in
:mod:`multimodal` batches over; they are deliberately Spark-free so they
unit-test in microseconds.

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


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF — stdlib box writer + container-level sample parser
# ---------------------------------------------------------------------------
# Frame SAMPLING never decodes codec payloads: a production sampler walks
# the container's sample tables (stts/stsc/stsz/stco) and slices the
# encoded sample bytes for a downstream decoder. That container layer is
# pure ISO/IEC 14496-12 box structure — parseable and writable with
# struct alone — so the one previously-stubbed media operator
# (multimodal.sample_frames) gets a REAL implementation: real box walk,
# real chunk-run expansion, real absolute-offset slicing. Only the codec
# payload stays opaque (as it does for a real sampler); the synthetic
# files fill samples from a deterministic formula so the DuckDB oracle
# recomputes every sampled frame's stats symbolically.

MP4_TIMESCALE = 1000
MP4_FRAME_DUR = 40  # ticks/frame at timescale 1000 -> 25 fps


def synth_mp4_frames(seed: int) -> int:
    return 8 + seed % 8


def synth_mp4_frame_size(seed: int, i: int) -> int:
    # variable per frame: exercises a real stsz table (sample_size=0)
    return 16 + (seed + i) % 16


def synth_mp4_frame_byte(seed: int, i: int, j: int) -> int:
    return (seed * 7 + i * 31 + j * 13) % 256


def _b(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _b(tag, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def synth_mp4_bytes(seed: int) -> bytes:
    """A structurally real ISO-BMFF file: ftyp + mdat + moov with one
    video track whose sample tables index the mdat samples — chunks of 3
    (last partial) so stsc's run-length semantics and stco's absolute
    offsets are genuinely exercised. Codec payloads are opaque formula
    bytes (sample entry 'mp4v'); any box walker / ffprobe reads the
    structure."""
    n = synth_mp4_frames(seed)
    samples = [
        bytes(
            synth_mp4_frame_byte(seed, i, j)
            for j in range(synth_mp4_frame_size(seed, i))
        )
        for i in range(n)
    ]
    chunks = [samples[c : c + 3] for c in range(0, n, 3)]
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _b(b"mdat", b"".join(samples))
    # stco holds ABSOLUTE file offsets; mdat body starts after ftyp + the
    # mdat header (8 bytes)
    pos = len(ftyp) + 8
    offsets = []
    for ch in chunks:
        offsets.append(pos)
        pos += sum(len(s) for s in ch)

    # sample description: minimal VisualSampleEntry ('mp4v', opaque)
    entry = _b(
        b"mp4v",
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", 64, 48)  # width, height
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, MP4_FRAME_DUR))
    stsc_entries = [(1, 3, 1)]
    if n % 3:
        stsc_entries.append((len(chunks), n % 3, 1))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _b(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _b(b"dinf", dref)
    minf = _b(b"minf", vmhd + dinf + stbl)
    dur = n * MP4_FRAME_DUR
    mdhd = _full(
        b"mdhd",
        struct.pack(">IIIIHH", 0, 0, MP4_TIMESCALE, dur, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"flux\x00"
    )
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 64 << 16, 48 << 16),
        flags=3,
    )
    trak = _b(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, MP4_TIMESCALE, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _b(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(buf: bytes, start: int, end: int):
    """Iterate (tag, body_start, body_end) over a box range; supports
    64-bit largesize and size-0 (to end of enclosing box)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at {pos}")
        size = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize at {pos}")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {tag!r} overruns enclosure at {pos}")
        yield tag, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, tag: bytes):
    for t, b, e in _boxes(buf, start, end):
        if t == tag:
            yield b, e


def mp4_video_samples(payload: bytes) -> dict:
    """Container-level frame index of the first video track: walks
    moov/trak/mdia (hdlr = 'vide'), expands stts into per-sample
    timestamps, walks stsc's chunk runs against stco's absolute offsets,
    and slices each sample's bytes out of the file. Returns
    {"timescale": int, "frames": [(idx, pts_ticks, bytes), ...]}.
    Raises ValueError on structural corruption (truncated boxes, missing
    tables, samples outside the file) — the quarantine signal a media
    lake routes on."""
    n_end = len(payload)
    for moov_b, moov_e in _find(payload, 0, n_end, b"moov"):
        for trak_b, trak_e in _find(payload, moov_b, moov_e, b"trak"):
            for mdia_b, mdia_e in _find(payload, trak_b, trak_e, b"mdia"):
                hdlr = next(_find(payload, mdia_b, mdia_e, b"hdlr"), None)
                if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
                    continue
                mdhd = next(_find(payload, mdia_b, mdia_e, b"mdhd"), None)
                if mdhd is None:
                    raise ValueError("video trak missing mdhd")
                timescale = struct.unpack_from(">I", payload, mdhd[0] + 12)[0]
                minf = next(_find(payload, mdia_b, mdia_e, b"minf"), None)
                stbl = minf and next(
                    _find(payload, minf[0], minf[1], b"stbl"), None
                )
                if not stbl:
                    raise ValueError("video trak missing minf/stbl")

                def table(tag: bytes) -> tuple[int, int]:
                    t = next(_find(payload, stbl[0], stbl[1], tag), None)
                    if t is None:
                        raise ValueError(f"stbl missing {tag.decode()}")
                    return t

                # stts -> cumulative pts per sample
                b0, _ = table(b"stts")
                n_runs = struct.unpack_from(">I", payload, b0 + 4)[0]
                pts, t = [], 0
                for r in range(n_runs):
                    cnt, delta = struct.unpack_from(
                        ">II", payload, b0 + 8 + 8 * r
                    )
                    for _ in range(cnt):
                        pts.append(t)
                        t += delta
                n = len(pts)
                # stsz -> per-sample sizes (or constant)
                b0, _ = table(b"stsz")
                const, cnt = struct.unpack_from(">II", payload, b0 + 4)
                if cnt != n:
                    raise ValueError(f"stsz count {cnt} != stts samples {n}")
                sizes = (
                    [const] * n
                    if const
                    else list(struct.unpack_from(f">{n}I", payload, b0 + 12))
                )
                # stco chunk offsets
                b0, _ = table(b"stco")
                n_chunks = struct.unpack_from(">I", payload, b0 + 4)[0]
                offs = list(struct.unpack_from(f">{n_chunks}I", payload, b0 + 8))
                # stsc runs -> samples-per-chunk per chunk index
                b0, _ = table(b"stsc")
                n_runs = struct.unpack_from(">I", payload, b0 + 4)[0]
                runs = [
                    struct.unpack_from(">III", payload, b0 + 8 + 12 * r)[:2]
                    for r in range(n_runs)
                ]
                spc = []
                for r, (first, per) in enumerate(runs):
                    last = (
                        runs[r + 1][0] - 1 if r + 1 < len(runs) else n_chunks
                    )
                    spc += [per] * (last - first + 1)
                if len(spc) != n_chunks:
                    raise ValueError("stsc runs do not cover stco chunks")
                # chunk walk: absolute file offset per sample
                frames = []
                idx = 0
                for c, (off, per) in enumerate(zip(offs, spc)):
                    pos = off
                    for _ in range(per):
                        if idx >= n:
                            raise ValueError("stsc indexes more samples than stsz")
                        size = sizes[idx]
                        if pos + size > len(payload):
                            raise ValueError(
                                f"sample {idx} [{pos}:{pos + size}] outside file"
                            )
                        frames.append((idx, pts[idx], payload[pos : pos + size]))
                        pos += size
                        idx += 1
                if idx != n:
                    raise ValueError(f"chunk walk covered {idx}/{n} samples")
                return {"timescale": timescale, "frames": frames}
    raise ValueError("no video track found")


# ---------------------------------------------------------------------------
# JPEG — sequential + progressive DCT on struct + numpy (the last
# format that was library-blocked; VERDICT r7 stretch item). The
# DECODER is general: it reads DQT/DHT from the file (any tables),
# handles byte stuffing, restart intervals, 8/16-bit quant precision,
# grayscale, 4:4:4 YCbCr color, (r9, VERDICT r8 #2) subsampled
# 4:2:0/4:2:2/4:4:0 via the T.81 A.2.3 interleaved-MCU walk with
# replication chroma upsampling — the sampling of virtually every
# camera/web JPEG — and (r10, VERDICT r9 #1) PROGRESSIVE (SOF2)
# streams via multi-scan coefficient accumulation (G.2 spectral
# selection + successive approximation, EOB runs, correction bits);
# it rejects lossless/hierarchical/arithmetic streams with ValueError
# (the quarantine signal) rather than guessing. The ENCODERS emit real
# JFIF baseline and progressive files any viewer opens.
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Huffman tables, ITU T.81 Annex K (public spec constants)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# flat quant table used by the synthesis path: constant-16 keeps the
# DC-only reconstruction an exact integer formula the DuckDB oracle can
# mirror (see synth_jpeg_pixel); a perfectly legal baseline table
_FLAT_Q16 = [16] * 64


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbol ->
    (code, length). Validates the (bits, vals) pair describes a prefix
    code so a corrupted DHT fails loudly."""
    if sum(bits) != len(vals):
        raise ValueError("DHT: bits/values count mismatch")
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("DHT: oversubscribed prefix code")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        # pad the trailing partial byte with 1-bits (T.81 F.1.2.3); going
        # through put() keeps 0xFF stuffing correct for the padded byte
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_jpeg_bytes(
    planes: list,
    width: int,
    height: int,
    qtable: list[int] | None = None,
    restart_interval: int = 0,
    sampling: list[tuple[int, int]] | None = None,
    exif_orientation: int | None = None,
) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr) component planes into a REAL
    baseline JFIF file: JFIF APP0, DQT, SOF0, the four Annex K DHTs, SOS,
    Huffman-coded entropy data with byte stuffing. ``sampling`` gives the
    (Hi, Vi) factor per component (default all 1x1 = 4:4:4/grayscale);
    4:2:0 is ``[(2, 2), (1, 1), (1, 1)]`` with the chroma planes supplied
    at their SUBSAMPLED resolution (ceil(width*Hi/Hmax) x
    ceil(height*Vi/Vmax)) — the encoder interleaves Vi x Hi blocks per
    component per MCU exactly as ITU-T T.81 A.2.3 prescribes. Forward
    path per block: level shift, float DCT, quantize with round-half-up
    (+1e-9 guard so coefficients that are mathematically exact halves do
    not fall to float noise — what makes the synthesis formula exactly
    reproducible by the oracle)."""
    import numpy as np

    q = list(qtable or _FLAT_Q16)
    ncomp = len(planes)
    if ncomp not in (1, 3):
        raise ValueError(f"1 or 3 components, got {ncomp}")
    samp = sampling or [(1, 1)] * ncomp
    if len(samp) != ncomp:
        raise ValueError("sampling length must match planes")
    if ncomp == 1 and samp != [(1, 1)]:
        # mirror of the decoder's T.81 A.2 rule (r9 advisor finding):
        # single-component frames are coded non-interleaved and sampling
        # factors do not apply — emitting them would produce a file this
        # interleaving encoder cannot faithfully represent
        raise ValueError("single-component frames must use 1x1 sampling")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    A = _dct_matrix()
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qm = np.array(q, dtype=np.float64)[np.argsort(ZIGZAG)].reshape(8, 8)

    # tables: luminance for component 0, chrominance for 1-2
    dc_tabs = [_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)] + [
        _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ] * (ncomp - 1)
    ac_tabs = [_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)] + [
        _huff_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    ] * (ncomp - 1)

    comps = []
    for p, (hi, vi) in zip(planes, samp):
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        arr = np.asarray(p, dtype=np.float64).reshape(ch, cw)
        # pad to the MCU-grid block multiple by edge replication
        arr = np.pad(
            arr,
            ((0, mcuy * vi * 8 - ch), (0, mcux * hi * 8 - cw)),
            mode="edge",
        )
        comps.append(arr - 128.0)

    w = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # RSTn: byte-align (1-pad), emit the marker RAW (markers
                # are never byte-stuffed), reset DC predictions
                w.flush()
                w.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                preds = [0] * ncomp
            mcu += 1
            for ci in range(ncomp):
                hi, vi = samp[ci]
                blocks = [
                    (my * vi + v, mx * hi + h_)
                    for v in range(vi)
                    for h_ in range(hi)
                ]
                for by, bx in blocks:
                    _encode_jpeg_block(
                        w, comps, preds, ci, by, bx, A, qm, dc_tabs, ac_tabs
                    )
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    if exif_orientation is not None:
        out += seg(0xFFE1, exif_app1_segment(exif_orientation))
    out += seg(0xFFDB, bytes([0x00]) + bytes(q))  # DQT id 0, 8-bit
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # sampling, qtable 0
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (0, 1, _DC_CHR_BITS, _DC_CHR_VALS),
        (1, 1, _AC_CHR_BITS, _AC_CHR_VALS),
    )[: 2 * ncomp if ncomp == 1 else 4]:
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_block(
    w, comps, preds, ci, by, bx, A, qm, dc_tabs, ac_tabs
) -> None:
    """Forward-code one 8x8 block of component ``ci`` at block coords
    (by, bx): DCT, quantize, differential DC + run-length AC Huffman."""
    import numpy as np

    blk = comps[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
    coef = A @ blk @ A.T
    qc = np.floor(coef / qm + 0.5 + 1e-9).astype(np.int64)
    zz = qc.reshape(-1)[ZIGZAG]
    # DC: differential, category + offset bits
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    s = _category(diff)
    code, ln = dc_tabs[ci][s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # AC: run-length coded
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tabs[ci][0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tabs[ci][(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_tabs[ci][0x00]  # EOB
        w.put(code, ln)


# Huffman tables for the PROGRESSIVE encoder: the Annex K sequential AC
# tables lack the EOBn symbols (r<<4 for r >= 1) progressive scans need,
# so the progressive writer uses flat canonical tables — DC: symbols
# 0..11 at length 4; AC: all 256 symbols split 128 at length 8 + 128 at
# length 9 (a DHT bits byte caps at 255, and the split keeps the
# all-ones code of the maximum length unused, T.81 C.2). Verbose but
# fully legal; table choice never affects decoded VALUES, only size.
_PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_DC_VALS = list(range(12))
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))


def encode_jpeg_progressive_bytes(
    planes: list,
    width: int,
    height: int,
    qtable: list[int] | None = None,
    sampling: list[tuple[int, int]] | None = None,
    dc_al: int = 1,
    ac_al: int = 1,
    ac_split: int = 5,
) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr) planes as a REAL progressive
    (SOF2) JFIF file — the T.81 G.2 scan script most web encoders emit:

      1. interleaved DC-first scan at successive approximation ``dc_al``;
      2. per component, AC-first scans split spectrally at ``ac_split``
         (band [1, ac_split] then [ac_split+1, 63]) at approximation
         ``ac_al``, with EOB-run coding across blocks;
      3. DC refinement scans down to bit 0 (one raw bit per data unit);
      4. per component, AC refinement scans down to bit 0 with the
         G.1.2.3 correction-bit procedure (newly-significant coefficients
         as size-1 run symbols + sign, history coefficients as buffered
         correction bits, EOB runs carrying the covered blocks' bits).

    The quantized coefficients are exactly :func:`encode_jpeg_bytes`'s
    forward path (level shift, float DCT, round-half-up quantization),
    so a progressive file and a baseline file of the same planes decode
    to bit-identical pixels — the equivalence the roundtrip tests pin.
    """
    import numpy as np

    q = list(qtable or _FLAT_Q16)
    ncomp = len(planes)
    if ncomp not in (1, 3):
        raise ValueError(f"1 or 3 components, got {ncomp}")
    samp = sampling or [(1, 1)] * ncomp
    if len(samp) != ncomp:
        raise ValueError("sampling length must match planes")
    if ncomp == 1 and samp != [(1, 1)]:
        # mirror of the decoder's A.2 rule: single-component frames are
        # non-interleaved and sampling factors do not apply
        raise ValueError("single-component frames must use 1x1 sampling")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    A = _dct_matrix()
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qm = np.array(q, dtype=np.float64)[np.argsort(ZIGZAG)].reshape(8, 8)

    # forward-quantize every block once (identical math to the baseline
    # encoder) into per-component zigzag coefficient stores
    coefs = []
    for p, (hi, vi) in zip(planes, samp):
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        arr = np.asarray(p, dtype=np.float64).reshape(ch, cw)
        arr = np.pad(
            arr,
            ((0, mcuy * vi * 8 - ch), (0, mcux * hi * 8 - cw)),
            mode="edge",
        )
        arr = arr - 128.0
        czz = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for by in range(mcuy * vi):
            for bx in range(mcux * hi):
                blk = arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = A @ blk @ A.T
                qc = np.floor(coef / qm + 0.5 + 1e-9).astype(np.int64)
                czz[by, bx] = qc.reshape(-1)[ZIGZAG]
        coefs.append(czz)

    dc_tab = _huff_codes(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_tab = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    comps_like = [
        (ci + 1, samp[ci][0], samp[ci][1], 0) for ci in range(ncomp)
    ]

    def units_for(scan):
        return _scan_mcus(
            scan, comps_like, width, height, hmax, vmax, mcux, mcuy
        )

    def dc_first(wtr, al):
        preds = [0] * ncomp
        scan = [(ci, 0, 0) for ci in range(ncomp)]
        for us in units_for(scan):
            for ci, _dt, _at, by, bx in us:
                v = int(coefs[ci][by, bx][0]) >> al  # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                code, ln = dc_tab[s]
                wtr.put(code, ln)
                if s:
                    wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def dc_refine(wtr, al):
        scan = [(ci, 0, 0) for ci in range(ncomp)]
        for us in units_for(scan):
            for ci, _dt, _at, by, bx in us:
                wtr.put((int(coefs[ci][by, bx][0]) >> al) & 1, 1)

    def ac_first(wtr, ci, ss, se, al):
        eobrun = 0

        def flush():
            nonlocal eobrun
            if not eobrun:
                return
            nb = eobrun.bit_length() - 1
            code, ln = ac_tab[nb << 4]
            wtr.put(code, ln)
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            eobrun = 0

        for us in units_for([(ci, 0, 0)]):
            (_ci, _dt, _at, by, bx) = us[0]
            blk = coefs[ci][by, bx]
            r = 0
            for k in range(ss, se + 1):
                t = int(blk[k])
                t = (t >> al) if t >= 0 else -((-t) >> al)
                if t == 0:
                    r += 1
                    continue
                flush()
                while r > 15:
                    code, ln = ac_tab[0xF0]
                    wtr.put(code, ln)
                    r -= 16
                s = _category(t)
                code, ln = ac_tab[(r << 4) | s]
                wtr.put(code, ln)
                wtr.put(t if t >= 0 else t + (1 << s) - 1, s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()

    def ac_refine(wtr, ci, ss, se, al):
        eobrun = 0
        pend: list[int] = []  # correction bits of EOB-run-covered blocks

        def flush():
            nonlocal eobrun, pend
            if not eobrun:
                return
            nb = eobrun.bit_length() - 1
            code, ln = ac_tab[nb << 4]
            wtr.put(code, ln)
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            for b in pend:
                wtr.put(b, 1)
            eobrun = 0
            pend = []

        for us in units_for([(ci, 0, 0)]):
            (_ci, _dt, _at, by, bx) = us[0]
            blk = coefs[ci][by, bx]
            av = [abs(int(blk[k])) >> al for k in range(64)]
            eobidx = max(
                (k for k in range(ss, se + 1) if av[k] == 1), default=0
            )
            r = 0
            br_bits: list[int] = []
            for k in range(ss, se + 1):
                t = av[k]
                if t == 0:
                    r += 1
                    continue
                # ZRLs are emitted lazily at the next nonzero position,
                # and only when a newly-significant coefficient follows
                # (otherwise the zeros fold into the EOB run)
                while r > 15 and k <= eobidx:
                    flush()
                    code, ln = ac_tab[0xF0]
                    wtr.put(code, ln)
                    r -= 16
                    for b in br_bits:
                        wtr.put(b, 1)
                    br_bits = []
                if t > 1:  # history-significant: buffered correction bit
                    br_bits.append(t & 1)
                    continue
                flush()
                code, ln = ac_tab[(r << 4) | 1]
                wtr.put(code, ln)
                wtr.put(1 if int(blk[k]) > 0 else 0, 1)
                for b in br_bits:
                    wtr.put(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pend.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush()
        flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(0xFFDB, bytes([0x00]) + bytes(q))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += seg(
        0xFFC4, bytes([0x00]) + bytes(_PROG_DC_BITS) + bytes(_PROG_DC_VALS)
    )
    out += seg(
        0xFFC4, bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    )

    def sos(scan_comps, ss, se, ah, al, body_writer):
        nonlocal out
        hdr = bytes([len(scan_comps)])
        for ci in scan_comps:
            hdr += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, hdr)
        wtr = _BitWriter()
        body_writer(wtr)
        wtr.flush()
        out += wtr.out

    split = min(max(1, ac_split), 63)
    sos(list(range(ncomp)), 0, 0, 0, dc_al, lambda w_: dc_first(w_, dc_al))
    for ci in range(ncomp):
        sos([ci], 1, split, 0, ac_al,
            lambda w_, c=ci: ac_first(w_, c, 1, split, ac_al))
        if split < 63:
            sos([ci], split + 1, 63, 0, ac_al,
                lambda w_, c=ci: ac_first(w_, c, split + 1, 63, ac_al))
    for a in range(dc_al - 1, -1, -1):
        sos(list(range(ncomp)), 0, 0, a + 1, a,
            lambda w_, aa=a: dc_refine(w_, aa))
    for a in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            sos([ci], 1, split, a + 1, a,
                lambda w_, c=ci, aa=a: ac_refine(w_, c, 1, split, aa))
            if split < 63:
                sos([ci], split + 1, 63, a + 1, a,
                    lambda w_, c=ci, aa=a: ac_refine(w_, c, split + 1, 63, aa))
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: de-stuffs FF00, stops at markers
    (exposing them for restart handling), byte-aligns on demand."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self._n < 25 and self.marker is None:
            if self.pos >= len(d):
                raise ValueError("truncated entropy-coded segment")
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(d):
                    raise ValueError("truncated marker in entropy segment")
                nxt = d[self.pos + 1]
                if nxt == 0x00:  # stuffed FF data byte
                    self.pos += 2
                else:
                    # any real marker ends the entropy segment: RSTn/EOI
                    # mid-scan (handled by restart()), or the next scan's
                    # DHT/SOS/DQT in a progressive stream. A marker that
                    # arrives while bits are still demanded surfaces as
                    # "bit starvation" in bits() — same loud failure the
                    # old unexpected-marker raise gave for corruption.
                    self.marker = 0xFF00 | nxt
                    return
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._n += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self._n < n:
            self._fill()
            if self.marker is not None and self._n < n:
                raise ValueError("bit starvation at segment end")
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def restart(self) -> None:
        """Consume an expected RSTn marker and realign: scan forward
        (buffering any pad bits) until the marker, then discard the pad
        bits AFTER the marker is found — zeroing first would let pad
        bits pulled in by the scan leak into the next MCU."""
        if self.marker is None:
            self._fill()
        m = self.marker
        if m is None or not (0xFFD0 <= m <= 0xFFD7):
            raise ValueError(f"expected restart marker, got {m!r}")
        self.pos += 2
        self.marker = None
        self._acc, self._n = 0, 0


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (corrupt entropy data)")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _scan_mcus(scan, comps, w, h, hmax, vmax, mcux, mcuy):
    """MCU walk order for one scan as a list of MCUs, each a list of
    (comp idx, dc table id, ac table id, block y, block x) data units.

    T.81 A.2: a single-component scan is NON-interleaved — one data unit
    per MCU, raster order over the component's OWN block grid
    ``ceil(cw/8) x ceil(ch/8)`` (cw = ceil(w*Hi/Hmax)), sampling factors
    not applied (the r9 advisor finding: a grayscale frame declaring
    2x2 factors must decode as a 1x1 raster walk). A multi-component
    scan interleaves Vi x Hi data units per component per MCU over the
    frame MCU grid (A.2.3)."""
    if len(scan) == 1:
        idx, dct_id, act_id = scan[0]
        _cid, hi, vi, _tq = comps[idx]
        cw = (w * hi + hmax - 1) // hmax
        ch_ = (h * vi + vmax - 1) // vmax
        return [
            [(idx, dct_id, act_id, by, bx)]
            for by in range((ch_ + 7) // 8)
            for bx in range((cw + 7) // 8)
        ]
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            us = []
            for idx, dct_id, act_id in scan:
                _cid, hi, vi, _tq = comps[idx]
                for v in range(vi):
                    for h_ in range(hi):
                        us.append(
                            (idx, dct_id, act_id, my * vi + v, mx * hi + h_)
                        )
            mcus.append(us)
    return mcus


def _decode_seq_scan(br, scan, comps, coefs, htables, mcus, restart_interval):
    """Baseline sequential scan: full DC diff + AC run-length per data
    unit, written into the zigzag coefficient store."""
    preds = [0] * len(comps)
    mcu = 0
    for us in mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.restart()
            preds = [0] * len(comps)
        for idx, dct_id, act_id, by, bx in us:
            dt = htables.get((0, dct_id))
            at = htables.get((1, act_id))
            if dt is None or at is None:
                raise ValueError("scan uses undefined DHT")
            blk = coefs[idx][by, bx]
            s = _huff_decode(br, dt)
            diff = _extend(br.bits(s), s) if s else 0
            preds[idx] += diff
            blk[0] = preds[idx]
            k = 1
            while k < 64:
                sym = _huff_decode(br, at)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                blk[k] = _extend(br.bits(size), size)
                k += 1
        mcu += 1


def _decode_prog_scan(
    br, scan, comps, coefs, htables, mcus, ss, se, ah, al, restart_interval
):
    """One progressive scan (T.81 G.2): spectral selection [Ss, Se],
    successive approximation Ah -> Al.

    * DC first (Ss=0, Ah=0): diff-coded DC / 2^Al (arithmetic shift),
      stored shifted left by Al; interleaved or single-component.
    * DC refinement (Ss=0, Ah>0): one raw bit per data unit, ORed in at
      position Al.
    * AC first (Ss>0, Ah=0): run-length symbols as in sequential, values
      scaled by 2^Al, plus EOBn symbols — an EOB run of (1<<r)+bits(r)
      blocks whose remaining band coefficients are all zero.
    * AC refinement (Ss>0, Ah>0): the correction-bit procedure
      (G.1.2.3): newly-significant coefficients arrive as run symbols
      with size 1 and a sign bit; already-significant coefficients
      consume one correction bit each as the run walk passes them; EOB
      runs carry the covered blocks' correction bits after the symbol.
    AC scans must be single-component (enforced by the caller)."""
    preds = [0] * len(comps)
    eobrun = 0
    p1 = 1 << al
    mcu = 0
    for us in mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.restart()
            preds = [0] * len(comps)
            eobrun = 0
        for idx, dct_id, act_id, by, bx in us:
            blk = coefs[idx][by, bx]
            if ss == 0:  # DC scan
                if ah == 0:
                    dt = htables.get((0, dct_id))
                    if dt is None:
                        raise ValueError("scan uses undefined DHT")
                    s = _huff_decode(br, dt)
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[idx] += diff
                    blk[0] = preds[idx] << al
                else:
                    if br.bits(1):
                        blk[0] |= p1
                continue
            at = htables.get((1, act_id))
            if at is None:
                raise ValueError("scan uses undefined DHT")
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _huff_decode(br, at)
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << run) - 1  # EOBn; this block counts
                        if run:
                            eobrun += br.bits(run)
                        break
                    k += run
                    if k > se:
                        raise ValueError("AC run past Se")
                    blk[k] = _extend(br.bits(size), size) << al
                    k += 1
                continue
            # AC refinement
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _huff_decode(br, at)
                    run, size = sym >> 4, sym & 0x0F
                    newval = 0
                    if size == 0:
                        if run < 15:
                            eobrun = 1 << run  # EOBn (decremented below)
                            if run:
                                eobrun += br.bits(run)
                            break
                        # run == 15: skip 16 zero-history positions
                    else:
                        if size != 1:
                            raise ValueError("bad AC refinement symbol")
                        newval = p1 if br.bits(1) else -p1
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.bits(1) and not (v & p1):
                                blk[k] = v + (p1 if v > 0 else -p1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    v = int(blk[k])
                    if v != 0 and br.bits(1) and not (v & p1):
                        blk[k] = v + (p1 if v > 0 else -p1)
                    k += 1
                eobrun -= 1
        mcu += 1


def _jpeg_idct_planes(coefs, comps, qtables, A):
    """Dequantize + float IDCT every stored block into full sample
    planes (the shared back half of sequential and progressive
    decoding — identical arithmetic to the pre-r10 inline form)."""
    import numpy as np

    planes = []
    for ci, (_cid, _hi, _vi, tq) in enumerate(comps):
        q = qtables.get(tq)
        if q is None:
            raise ValueError("component uses undefined DQT")
        qa = np.asarray(q, dtype=np.float64)
        bh, bw = coefs[ci].shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = coefs[ci][by, bx] * qa
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    A.T @ coef.reshape(8, 8) @ A
                )
        planes.append(plane)
    return planes


def _jpeg_emit(planes, comps, w, h):
    """Crop each plane to its component resolution, round, upsample
    chroma by replication, color-convert, interleave — the output half
    shared by the sequential and progressive paths (bit-identical to
    the pre-r10 inline form)."""
    import numpy as np

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for p, (_cid, hi, vi, _tq) in zip(planes, comps):
        # crop to the component's true resolution (T.81 A.1.1:
        # ceil(dim * factor / max)), round at COMPONENT res — same
        # sample values a 1x1 decode would produce — then replicate up
        # to full resolution (nearest upsampling)
        cw = (w * hi + hmax - 1) // hmax
        ch_ = (h * vi + vmax - 1) // vmax
        ip = np.clip(
            np.floor(p[:ch_, :cw] + 128.0 + 0.5 + 1e-9), 0, 255
        ).astype(np.int64)
        if hi != hmax or vi != vmax:
            if hmax % hi or vmax % vi:
                raise ValueError("non-integer chroma sampling ratio")
            ip = np.repeat(
                np.repeat(ip, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        else:
            ip = ip[:h, :w]
        out.append(ip)
    if len(out) == 3:  # JFIF YCbCr -> RGB, BT.601 full range
        y, cb, cr = (o.astype(np.float64) for o in out)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = [
            np.clip(np.floor(c + 0.5 + 1e-9), 0, 255).astype(np.int64)
            for c in (r, g, b)
        ]
    arrs = [o.astype(np.uint8) for o in out]
    pix = (
        arrs[0].tobytes()
        if len(arrs) == 1
        else np.stack(arrs, axis=-1).tobytes()
    )
    return w, h, len(arrs), pix


def jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential (SOF0/1) or PROGRESSIVE (SOF2, r10)
    JPEG — Huffman, 8-bit samples; grayscale, 4:4:4, and subsampled
    4:2:0/4:2:2/4:4:0 color: full marker walk, DQT/DHT as found in the
    file, byte de-stuffing, DRI restart intervals, the T.81 A.2.3
    interleaved-MCU walk (Vi x Hi blocks per component per MCU) for
    interleaved scans and the A.2 raster walk for single-component
    scans, progressive spectral-selection/successive-approximation scan
    accumulation (G.2: DC first/refine, AC first/refine with EOB runs
    and correction bits), then dequantize + float IDCT + level shift
    per block and chroma upsampling by sample replication (nearest —
    the standard fast path) to full resolution. Color output is JFIF
    YCbCr -> RGB (BT.601 full range). Returns (width, height, channels,
    pixel_bytes) with samples interleaved row-major — the same contract
    as :func:`png_pixels`, so transcode/resize pipelines compose the
    two decoders interchangeably. Raises ValueError on structural
    corruption, non-integer sampling ratios, lossless/hierarchical
    frames, or arithmetic-coded streams — the quarantine signal."""
    import numpy as np

    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (height, width, [(comp_id, hi, vi, tq)])
    progressive = False
    coefs = None  # per-comp zigzag coefficient store (int64)
    decoded = False
    restart_interval = 0
    A = _dct_matrix()

    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {d[pos]:#x}")
        marker = d[pos + 1] if pos + 1 < len(d) else None
        if marker is None:
            raise ValueError("truncated marker")
        pos += 2
        if marker == 0xD9:  # EOI
            if not decoded:
                raise ValueError("EOI before SOS (no image data)")
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(d):
            raise ValueError("truncated segment length")
        seglen = struct.unpack(">H", d[pos : pos + 2])[0]
        body = d[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("segment overruns file")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if len(raw) != n:
                    raise ValueError("truncated DQT")
                if pq:
                    vals = list(struct.unpack(f">{64}H", raw))
                else:
                    vals = list(raw)
                qtables[tq] = vals
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                codes = _huff_codes(bits, vals)
                htables[(cls, tid)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            progressive = marker == 0xC2
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"only 8-bit precision, got {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factor {hv:#x}")
                comps.append((cid, hi, vi, tq))
            if nc == 1:
                # T.81 A.2: single-component frames are coded
                # NON-interleaved; sampling factors do not apply (r9
                # advisor finding: a grayscale file declaring 2x2
                # factors — e.g. jpegtran -grayscale output — must walk
                # a 1x1 raster grid, not a 2x2 MCU grid)
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF type {marker:#x} "
                "(lossless/hierarchical/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp index in frame, dc table id, ac table id)
            h, w, comps = frame
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(
                    (
                        i
                        for i, (cid, _h, _v, _t) in enumerate(comps)
                        if cid == cs
                    ),
                    None,
                )
                if idx is None:
                    raise ValueError(f"scan references unknown comp {cs}")
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            if coefs is None:
                coefs = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for (_cid, hi, vi, _tq) in comps
                ]
            br = _BitReader(d, pos + seglen)
            if not progressive:
                if ns != len(comps):
                    raise ValueError(
                        "only single-scan (non-interleaved-full)"
                    )
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad baseline scan header")
                mcus = _scan_mcus(scan, comps, w, h, hmax, vmax, mcux, mcuy)
                _decode_seq_scan(
                    br, scan, comps, coefs, htables, mcus, restart_interval
                )
                # end-of-scan integrity: after the last MCU only pad bits
                # may remain before EOI (or a final RSTn). A truncated or
                # zero-overwritten entropy tail that happened to keep
                # decoding as valid symbols is caught here — the standard
                # completeness check a quarantining decoder needs.
                if br.marker is None:
                    br._fill()
                if br.marker not in (0xFFD9,) and not (
                    br.marker is not None and 0xFFD0 <= br.marker <= 0xFFD7
                ):
                    raise ValueError("entropy data does not terminate at EOI")
            else:
                if ss > se or se > 63:
                    raise ValueError("bad spectral selection")
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("AC scans must be single-component")
                mcus = _scan_mcus(scan, comps, w, h, hmax, vmax, mcux, mcuy)
                _decode_prog_scan(
                    br,
                    scan,
                    comps,
                    coefs,
                    htables,
                    mcus,
                    ss,
                    se,
                    ah,
                    al,
                    restart_interval,
                )
                # buffer any trailing pad bits so br.pos lands on the
                # next marker (DHT/SOS/EOI of the following scan)
                if br.marker is None:
                    br._fill()
                if br.marker is None:
                    raise ValueError("scan does not terminate at a marker")
            decoded = True
            pos = br.pos
            continue
        # APPn, COM, others: skip body
        pos += seglen
    if not decoded:
        raise ValueError("no SOS marker (not a decodable JPEG)")
    h, w, comps = frame
    planes = _jpeg_idct_planes(coefs, comps, qtables, A)
    return _jpeg_emit(planes, comps, w, h)


def decode_jpeg_bytes(payload: bytes) -> dict:
    """Stats wrapper over :func:`jpeg_pixels` (the shape the decode
    oracles compare): dict(width, height, channels, pixel_sum) with
    pixel_sum over all output channels."""
    w, h, ch, pix = jpeg_pixels(payload)
    return {"width": w, "height": h, "channels": ch, "pixel_sum": sum(pix)}


def synth_jpeg_dims(seed: int) -> tuple[int, int]:
    """(width, height) of the synthetic JPEG — whole 8x8 blocks."""
    return 8 * (2 + seed % 3), 8 * (1 + seed % 2)


def synth_jpeg_block(seed: int, bx: int, by: int) -> int:
    """Source gray value of the constant 8x8 block at (bx, by)."""
    return (seed * 7 + bx * 13 + by * 29) % 256


def synth_jpeg_pixel(seed: int, bx: int, by: int) -> int:
    """DECODED gray value of block (bx, by): a constant block survives
    the full DCT -> quantize(flat 16) -> Huffman -> dequantize -> IDCT
    round trip as an exact integer formula — DC = 8*(v-128), quantized
    round-half-up by 16 (= floor((v-127)/2)), reconstructed 2*that+128,
    clamped. The SQL twin in the oracle recomputes exactly this."""
    v = synth_jpeg_block(seed, bx, by)
    return min(255, max(0, 2 * ((v - 127) // 2) + 128))


def synth_jpeg_orientation(seed: int) -> int:
    """EXIF orientation of the synthetic baseline JPEG — cycles all eight
    legal values so the metadata gate exercises the full tag range."""
    return 1 + seed % 8


def synth_jpeg_bytes(seed: int) -> bytes:
    """A real baseline JFIF grayscale file: constant 8x8 blocks with
    values from :func:`synth_jpeg_block`, flat-16 quant table, and (r11)
    an EXIF APP1 carrying :func:`synth_jpeg_orientation` — opens in any
    viewer, decodes here to :func:`synth_jpeg_pixel` exactly."""
    w, h = synth_jpeg_dims(seed)
    plane = [
        synth_jpeg_block(seed, x // 8, y // 8)
        for y in range(h)
        for x in range(w)
    ]
    return encode_jpeg_bytes(
        [plane],
        w,
        h,
        qtable=_FLAT_Q16,
        exif_orientation=synth_jpeg_orientation(seed),
    )


def synth_jpeg_progressive_bytes(seed: int) -> bytes:
    """A REAL progressive (SOF2) 4:2:0 JFIF color file (r10 — replaces
    the r9 header-only stub): constant 16x16 YCbCr MCUs from
    :func:`synth_jpeg420_ycc` on the :func:`synth_jpeg_dims` grid,
    flat-16 quant, encoded by :func:`encode_jpeg_progressive_bytes`
    (interleaved DC-first + refine, split-band AC-first + refine — the
    scan script web encoders emit). Opens in any viewer; decodes here to
    :func:`synth_jpeg420_rgb` per MCU exactly, so the gate oracle stays
    fully symbolic. The kind census profiles it as progressive/4:2:0
    from the header alone, same as before."""
    w, h = synth_jpeg_dims(seed)
    yplane = [
        synth_jpeg420_ycc(seed, x // 16, y // 16)[0]
        for y in range(h)
        for x in range(w)
    ]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    cbplane = [
        synth_jpeg420_ycc(seed, x // 8, y // 8)[1]
        for y in range(ch)
        for x in range(cw)
    ]
    crplane = [
        synth_jpeg420_ycc(seed, x // 8, y // 8)[2]
        for y in range(ch)
        for x in range(cw)
    ]
    return encode_jpeg_progressive_bytes(
        [yplane, cbplane, crplane],
        w,
        h,
        qtable=_FLAT_Q16,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )


def synth_jpeg420_dims(seed: int) -> tuple[int, int]:
    """(width, height) of the synthetic 4:2:0 JPEG — whole 16x16 MCUs."""
    return 16 * (1 + seed % 2), 16 * (1 + seed % 3)


def synth_jpeg420_ycc(seed: int, mx: int, my: int) -> tuple[int, int, int]:
    """Source (Y, Cb, Cr) of the constant 16x16 MCU at (mx, my)."""
    return (
        (seed * 7 + mx * 13 + my * 29) % 256,
        (seed * 11 + mx * 17 + my * 23) % 256,
        (seed * 5 + mx * 19 + my * 31) % 256,
    )


def _jpeg_q16_roundtrip(v: int) -> int:
    """Constant-block DCT->flat-16-quant->IDCT round trip as the exact
    integer formula the oracles recompute (same as synth_jpeg_pixel)."""
    return min(255, max(0, 2 * ((v - 127) // 2) + 128))


def synth_jpeg420_rgb(seed: int, mx: int, my: int) -> tuple[int, int, int]:
    """DECODED (R, G, B) of every pixel in MCU (mx, my): each plane's
    constant value survives the flat-16 round trip as
    :func:`_jpeg_q16_roundtrip`, chroma replication keeps the MCU
    constant, and the BT.601 conversion + round-half-up matches the
    decoder's float64 expression term for term (the SQL twin recomputes
    exactly this)."""
    yv, cb, cr = (
        float(_jpeg_q16_roundtrip(v)) for v in synth_jpeg420_ycc(seed, mx, my)
    )
    r = yv + 1.402 * (cr - 128.0)
    g = yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yv + 1.772 * (cb - 128.0)
    import math

    return tuple(
        min(255, max(0, int(math.floor(c + 0.5 + 1e-9)))) for c in (r, g, b)
    )


def synth_jpeg420_bytes(seed: int) -> bytes:
    """A real baseline 4:2:0 JFIF color file (the sampling of virtually
    every camera/web JPEG): constant 16x16 YCbCr MCUs from
    :func:`synth_jpeg420_ycc`, luma at full res (4 blocks/MCU), chroma
    at quarter res (1 block/MCU), flat-16 quant — opens in any viewer,
    decodes here to :func:`synth_jpeg420_rgb` exactly."""
    w, h = synth_jpeg420_dims(seed)
    yplane = [
        synth_jpeg420_ycc(seed, x // 16, y // 16)[0]
        for y in range(h)
        for x in range(w)
    ]
    cbplane = [
        synth_jpeg420_ycc(seed, x // 8, y // 8)[1]
        for y in range(h // 2)
        for x in range(w // 2)
    ]
    crplane = [
        synth_jpeg420_ycc(seed, x // 8, y // 8)[2]
        for y in range(h // 2)
        for x in range(w // 2)
    ]
    return encode_jpeg_bytes(
        [yplane, cbplane, crplane],
        w,
        h,
        qtable=_FLAT_Q16,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )


def wav_pcm_features(payload: bytes, window: int = 16) -> dict:
    """Signal-analysis features over a decoded PCM16 mono stream — the
    audio-curation pre-filter (silence/clipping/energy screens) that runs
    before any expensive model touches the audio. All-integer math so
    the stats are engine-exact: energy is the int64 sum of squared
    samples, zero crossings count sign flips (s >= 0 is positive), peak
    is max |s|, and a window of ``window`` samples is silent when its
    peak stays under 1000 (~3% FS).

    Returns dict(n_samples, energy_sum, zero_crossings, peak,
    n_windows, silent_windows)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("wav_pcm_features: PCM16 mono only")
        n = w.getnframes()
        raw = w.readframes(n)
    s = struct.unpack(f"<{n}h", raw)
    zc = sum(1 for i in range(n - 1) if (s[i] >= 0) != (s[i + 1] >= 0))
    n_win = n // window
    silent = sum(
        1
        for wi in range(n_win)
        if max(abs(v) for v in s[wi * window : (wi + 1) * window]) < 1000
    )
    return {
        "n_samples": n,
        "energy_sum": sum(v * v for v in s),
        "zero_crossings": zc,
        "peak": max((abs(v) for v in s), default=0),
        "n_windows": n_win,
        "silent_windows": silent,
    }


def encode_png_bytes(
    pixels: bytes, width: int, height: int, channels: int
) -> bytes:
    """Encode interleaved 8-bit samples as a real PNG (filter-0
    scanlines, one IDAT) — the re-encode half every transcode/resize
    pipeline shares. ``channels`` 1/2/3/4 map to gray/gray+alpha/RGB/
    RGBA color types."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    rows = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride]
        for y in range(height)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )


def image_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Magic-number dispatch to the right REAL pixel decoder: PNG
    (:func:`png_pixels`) or JPEG — baseline or progressive
    (:func:`jpeg_pixels`). The
    uniform (w, h, channels, interleaved bytes) contract is what lets
    transcode/resize treat sources interchangeably."""
    if payload[:3] == b"\xff\xd8\xff":
        return jpeg_pixels(payload)
    return png_pixels(payload)


_SOF_MARKERS = {
    0xC0: "baseline",
    0xC1: "extended",
    0xC2: "progressive",
    0xC3: "lossless",
    0xC5: "diff-sequential",
    0xC6: "diff-progressive",
    0xC7: "diff-lossless",
    0xC9: "arith-sequential",
    0xCA: "arith-progressive",
    0xCB: "arith-lossless",
    0xCD: "arith-diff-sequential",
    0xCE: "arith-diff-progressive",
    0xCF: "arith-diff-lossless",
}


def _sampling_label(samps: list[tuple[int, int]]) -> str:
    """Conventional chroma-subsampling name from per-component (Hi, Vi)
    factors: gray / 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0, else 'other'."""
    if len(samps) == 1:
        return "gray"
    if len(samps) == 3 and samps[1] == (1, 1) and samps[2] == (1, 1):
        return {
            (1, 1): "4:4:4",
            (2, 1): "4:2:2",
            (1, 2): "4:4:0",
            (2, 2): "4:2:0",
        }.get(samps[0], "other")
    return "other"


def exif_app1_segment(orientation: int) -> bytes:
    """Minimal EXIF APP1 body: big-endian TIFF header + a one-entry IFD0
    holding tag 0x0112 (Orientation, type SHORT, count 1) — the layout of
    TIFF 6.0 / EXIF 2.3 §4.6.2 that every EXIF reader walks. Orientation
    1..8 per the spec (1 = upright; 3/6/8 the common rotations)."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")
    return (
        b"Exif\x00\x00"
        + b"MM\x00\x2a"  # big-endian TIFF, magic 42
        + struct.pack(">I", 8)  # IFD0 offset
        + struct.pack(">H", 1)  # one entry
        + struct.pack(">HHI", 0x0112, 3, 1)  # Orientation, SHORT, count 1
        + struct.pack(">HH", orientation, 0)  # value, left-justified pad
        + struct.pack(">I", 0)  # no next IFD
    )


def _parse_exif_orientation(tiff: bytes) -> int | None:
    """Walk a TIFF blob (the bytes after the APP1 ``Exif\\0\\0`` prefix)
    and return IFD0's Orientation (tag 0x0112) if present and valid.
    Handles both byte orders; malformed EXIF returns None (the scan must
    never quarantine a file over a broken vendor APP1)."""
    if len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return None
    (magic,) = struct.unpack_from(endian + "H", tiff, 2)
    if magic != 42:
        return None
    (ifd_off,) = struct.unpack_from(endian + "I", tiff, 4)
    if ifd_off + 2 > len(tiff):
        return None
    (n_entries,) = struct.unpack_from(endian + "H", tiff, ifd_off)
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(tiff):
            return None
        tag, typ, cnt = struct.unpack_from(endian + "HHI", tiff, e)
        if tag == 0x0112 and typ == 3 and cnt >= 1:
            (val,) = struct.unpack_from(endian + "H", tiff, e + 8)
            return val if 1 <= val <= 8 else None
    return None


def jpeg_header_metadata(payload: bytes) -> dict:
    """Header-only JPEG metadata: marker walk that STOPS at SOS — no
    entropy decode, no IDCT — returning dims, component count, table
    counts, restart interval, the quant-value sum (a cheap checksum
    of the quality setting), plus (r9) the SOF kind ('baseline' /
    'progressive' / ...) and the conventional chroma-sampling label
    ('gray' / '4:4:4' / '4:2:0' / ...), and (r11) the EXIF orientation
    from the APP1 IFD0 walk (tag 0x0112; default 1 = upright when absent
    — a rotated image is a different training example, so the corpus
    profile must surface it before decode). Unlike :func:`jpeg_pixels`,
    every SOFn frame type is VALID metadata here — the census scan must
    profile even frame types the decoder quarantines; since r10 the
    decoder covers progressive too, so the census's decodable share on
    the fixture corpus is 100%. Raises
    ValueError on structural corruption (same quarantine contract as
    :func:`jpeg_pixels`)."""
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n_q = n_h = 0
    quant_sum = 0
    restart_interval = 0
    orientation = 1  # EXIF default: absent APP1/tag means upright
    frame = None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {d[pos]:#x}")
        marker = d[pos + 1] if pos + 1 < len(d) else None
        if marker is None:
            raise ValueError("truncated marker")
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(d):
            raise ValueError("truncated segment length")
        seglen = struct.unpack(">H", d[pos : pos + 2])[0]
        body = d[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("segment overruns file")
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq = body[i] >> 4
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if len(raw) != n:
                    raise ValueError("truncated DQT")
                vals = (
                    struct.unpack(">64H", raw) if pq else list(raw)
                )
                quant_sum += sum(vals)
                n_q += 1
                i += n
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                nv = sum(body[i + 1 : i + 17])
                if i + 17 + nv > len(body):
                    raise ValueError("truncated DHT")
                n_h += 1
                i += 17 + nv
        elif marker in _SOF_MARKERS:
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            samps = [
                (body[6 + 3 * ci + 1] >> 4, body[6 + 3 * ci + 1] & 0x0F)
                for ci in range(nc)
            ]
            frame = (w, h, nc, marker, samps)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            orientation = _parse_exif_orientation(body[6:]) or orientation
        elif marker == 0xDA:
            break
        pos += seglen
    if frame is None:
        raise ValueError("no SOF before SOS")
    return {
        "width": frame[0],
        "height": frame[1],
        "channels": frame[2],
        "n_quant_tables": n_q,
        "n_huffman_tables": n_h,
        "restart_interval": restart_interval,
        "quant_sum": quant_sum,
        "sof_kind": _SOF_MARKERS[frame[3]],
        "sampling": _sampling_label(frame[4]),
        "orientation": orientation,
    }
