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

These are the per-payload functions the Arrow ``mapInPandas`` plumbing in
:mod:`multimodal` batches over; they are deliberately Spark-free so they
unit-test in microseconds. JPEG decode remains out of scope — it
genuinely needs an external codec library (probed every round).

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
