"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, width/height or sample-rate, n_bytes). The
Spark-side plumbing — schema, Arrow-batched mapInPandas decode, partition
sizing — is real and tested, and since round 5 so are two codecs:

* :func:`decode_image` / :func:`resize_images` — REAL PNG (stdlib
  zlib/struct codec in ``codecs.py``: CRC-validated chunk walk, DEFLATE,
  all five scanline filters) and REAL JPEG, baseline + progressive
  (struct+numpy:
  Huffman entropy decode, dequant, IDCT — r8), dispatched by magic.
* :func:`decode_audio` — REAL RIFF/WAVE PCM16 (stdlib ``wave`` parser).
* :func:`sample_frames` — REAL container-level MP4 frame sampling
  (stdlib ISO-BMFF sample-table parser in ``codecs.py``); sampled frame
  bytes stay encoded (H.264 decode would need external codec libraries —
  PIL/soundfile/cv2 absent in this container, probed r4+r5).
* :func:`byte_features` is the deterministic fake decoder kept for the
  format-agnostic plumbing gate: per-payload byte statistics computed
  vectorized in pandas — the same batch shape any decoder uses.

Scale notes: payload columns dominate row width, so feature extraction
selects only (id, media, meta) — column pruning keeps the scan narrow; and
``spark.sql.files.maxPartitionBytes`` (not row count) governs partition
sizing when payloads are MBs. mapInPandas streams Arrow batches, so peak
executor memory is one batch of payloads, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_TYPE = (
    "modality STRING, width INT, height INT, sample_rate INT, n_bytes INT"
)

FEATURE_SCHEMA = (
    "doc_id LONG, n_bytes INT, byte_sum LONG, first_byte INT, last_byte INT, "
    "hex_digit_sum LONG"
)


def with_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic synthetic media payload to each row.

    Payload = raw bytes of md5(text) (16 bytes) — a stand-in for image
    bytes that is reproducible in any engine. Metadata is derived from
    n_chars so downstream operators can filter/partition on typed fields
    without touching payloads (the real-world pattern: predicate pushdown
    on metadata, payloads only decoded after pruning).
    """
    digest = F.md5(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.to_binary(digest, F.lit("hex")).alias("media"),
        F.struct(
            F.lit("image").alias("modality"),
            (F.length(text_col) % 640 + 16).cast("int").alias("width"),
            (F.length(text_col) % 480 + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(16).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake "decode": per-payload byte statistics via
    Arrow-batched mapInPandas — the exact plumbing a real image decoder
    would use (swap the loop body for PIL/torchvision calls).

    hex_digit_sum = sum of the two hex-digit values of every byte
    ((b >> 4) + (b & 15)) — chosen because a SQL oracle can recompute it
    from the md5 *hex string*, giving this pandas-UDF path an exact
    correctness check.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            rows = {
                id_col: pdf[id_col].values,
                "n_bytes": [len(b) for b in payloads],
                "byte_sum": [int(sum(b)) for b in payloads],
                "first_byte": [int(b[0]) if len(b) else -1 for b in payloads],
                "last_byte": [int(b[-1]) if len(b) else -1 for b in payloads],
                "hex_digit_sum": [
                    int(sum((x >> 4) + (x & 15) for x in b)) for b in payloads
                ],
            }
            yield pd.DataFrame(rows)

    return df.select(id_col, "media").mapInPandas(extract, schema=FEATURE_SCHEMA)


CHUNK_SCHEMA = "doc_id LONG, chunk_idx INT, n_bytes INT, chunk_sum LONG"


def chunk_payloads(
    df: DataFrame, chunk_size: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Split each payload into fixed-size chunks, one output row per chunk —
    the frame-sampling shape (:func:`sample_frames`) with a deterministic
    fake: a real video decoder would emit (id, frame_idx, frame_bytes)
    rows from the same mapInPandas loop.

    Output fan-out happens inside the Arrow batch (no explode of a
    collected list column), so peak memory is one batch of payloads and
    the downstream partitioning is inherited — at scale, repartition by
    (id, chunk_idx) only if a per-frame shuffle-heavy op follows.
    """

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["media"]):
                for ci in range(0, max(len(payload), 1), chunk_size):
                    chunk = payload[ci : ci + chunk_size]
                    ids.append(doc_id)
                    idxs.append(ci // chunk_size)
                    sizes.append(len(chunk))
                    sums.append(int(sum(chunk)))
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "n_bytes": sizes, "chunk_sum": sums}
            )

    return df.select(id_col, "media").mapInPandas(chunks, schema=CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# real codecs (stdlib-backed: PNG on zlib/struct, WAV on `wave` — see
# codecs.py; PIL/soundfile/cv2 remain absent in this container, probed r4+r5)
# ---------------------------------------------------------------------------

IMAGE_SCHEMA = "doc_id LONG, width INT, height INT, channels INT, pixel_sum LONG"
AUDIO_SCHEMA = (
    "doc_id LONG, sample_rate INT, n_channels INT, n_frames INT, "
    "duration_ms INT, abs_sum LONG"
)


def with_png_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a REAL PNG payload per row (signature, CRC'd chunks,
    DEFLATE — any viewer opens it), synthesized deterministically from the
    id so the decode oracle is symbolic. Arrow-batched like every payload
    producer here."""
    from .codecs import synth_png_bytes

    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [synth_png_bytes(int(s)) for s in pdf[seed_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=f"{id_col} LONG, media BINARY")


def with_wav_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a REAL mono PCM16 RIFF/WAVE payload per row (stdlib `wave`
    writer), synthesized deterministically from the id."""
    from .codecs import synth_wav_bytes

    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [synth_wav_bytes(int(s)) for s in pdf[seed_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=f"{id_col} LONG, media BINARY")


def with_jpeg_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a REAL baseline JFIF payload per row (stdlib+numpy encoder
    in codecs.py: DCT, flat-16 quantization, Annex K Huffman tables —
    any viewer opens it), synthesized deterministically from the id so
    the decode oracle is symbolic."""
    from .codecs import synth_jpeg_bytes

    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [synth_jpeg_bytes(int(s)) for s in pdf[seed_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=f"{id_col} LONG, media BINARY")


def with_jpeg420_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a REAL 4:2:0-subsampled baseline JFIF color payload per
    row (the sampling of virtually every camera/web JPEG — r9): luma at
    full resolution, chroma at quarter resolution, interleaved 6-block
    MCUs. Synthesized deterministically from the id so the decode
    oracle stays symbolic."""
    from .codecs import synth_jpeg420_bytes

    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [
                        synth_jpeg420_bytes(int(s)) for s in pdf[seed_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} LONG, media BINARY"
    )


def with_jpeg_progressive_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a REAL progressive (SOF2) 4:2:0 JFIF color payload per row
    (r10 — the scan script web encoders emit: DC first + refine,
    split-band AC first + refine). Synthesized deterministically from
    the id so the decode oracle stays symbolic."""
    from .codecs import synth_jpeg_progressive_bytes

    seed_col = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [
                        synth_jpeg_progressive_bytes(int(s))
                        for s in pdf[seed_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} LONG, media BINARY"
    )


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode over the Arrow mapInPandas plumbing, dispatched
    by magic number: PNG (signature + CRC'd chunk walk, IDAT inflate,
    all five scanline filters) and JPEG, baseline + progressive
    (marker walk, Huffman
    entropy decode, dequant + IDCT — codecs.py, r8). Returns (id, width,
    height, channels, pixel_sum). Unsupported payloads raise at
    execution; route them away first with :func:`sniff_media_type` — the
    100 TB dispatch pattern."""
    from .codecs import decode_jpeg_bytes, decode_png_bytes

    def dec_one(b: bytes) -> dict:
        if b[:3] == b"\xff\xd8\xff":
            return decode_jpeg_bytes(b)
        return decode_png_bytes(b)

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [dec_one(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [s["width"] for s in stats],
                    "height": [s["height"] for s in stats],
                    "channels": [s["channels"] for s in stats],
                    "pixel_sum": [s["pixel_sum"] for s in stats],
                }
            )

    return df.select(id_col, "media").mapInPandas(dec, schema=IMAGE_SCHEMA)


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL RIFF/WAVE decode (stdlib `wave` chunk parser + PCM16 frame
    unpack): (id, sample_rate, n_channels, n_frames, duration_ms,
    abs_sum)."""
    from .codecs import decode_wav_bytes

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_wav_bytes(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sample_rate": [s["sample_rate"] for s in stats],
                    "n_channels": [s["n_channels"] for s in stats],
                    "n_frames": [s["n_frames"] for s in stats],
                    "duration_ms": [s["duration_ms"] for s in stats],
                    "abs_sum": [s["abs_sum"] for s in stats],
                }
            )

    return df.select(id_col, "media").mapInPandas(dec, schema=AUDIO_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """REAL resize: PNG decode -> nearest-neighbor resample -> PNG
    re-encode, batched in the same mapInPandas shape. Returns
    (id, media) with the resized PNG payload."""
    from .codecs import encode_png_bytes, image_pixels, resize_nearest

    def rez(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["media"]:
                w, h, ch, pixels = image_pixels(bytes(b))
                resized = resize_nearest(pixels, w, h, ch, width, height)
                out.append(encode_png_bytes(resized, width, height, ch))
            yield pd.DataFrame({id_col: pdf[id_col].values, "media": out})

    return df.select(id_col, "media").mapInPandas(
        rez, schema=f"{id_col} LONG, media BINARY"
    )


FRAME_SCHEMA = (
    "doc_id LONG, frame_idx INT, pts_ms LONG, n_bytes INT, "
    "byte_sum LONG, frame BINARY"
)


def with_mp4_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """(id, media) with a REAL ISO-BMFF file per row (ftyp + mdat + one
    'vide' track whose stts/stsc/stsz/stco tables index the samples) —
    the MP4 twin of :func:`with_png_media` / :func:`with_wav_media`."""
    from .codecs import synth_mp4_bytes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seeds = pdf[seed_col or id_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [synth_mp4_bytes(int(s)) for s in seeds],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} LONG, media BINARY"
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL container-level video frame sampling (previously the repo's
    one stub — r7): walk the MP4's sample tables (codecs.mp4_video_samples
    — real ISO-BMFF box traversal, stts timestamp expansion, stsc/stco
    chunk-run walk), keep every ``every_n``-th sample, and emit one row
    per sampled frame with its presentation time and the still-ENCODED
    sample bytes. This is exactly what a production sampler does before
    handing frames to a decoder fleet: sampling is a container operation,
    not a codec one, so it runs at scan bandwidth with zero external
    libraries. (Decoding the H.264/mp4v payload itself would need a codec
    library the container lacks — the sampled bytes stay opaque, as they
    do for any sampler.) One narrow Arrow ``mapInPandas`` with in-batch
    fan-out; no shuffle, no join — the same 100 TB shape as decode_image."""
    from .codecs import mp4_video_samples

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ptss, sizes, sums, frames = [], [], [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["media"]):
                parsed = mp4_video_samples(bytes(b))
                ts = parsed["timescale"]
                for idx, pts, data in parsed["frames"]:
                    if idx % every_n:
                        continue
                    ids.append(did)
                    idxs.append(idx)
                    ptss.append(pts * 1000 // ts)
                    sizes.append(len(data))
                    sums.append(sum(data))
                    frames.append(data)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "pts_ms": pd.Series(ptss, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.select("doc_id", "media").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# container-format sniffing (codec-free: real magic numbers, no decode)
# ---------------------------------------------------------------------------

# (format, hex signature at offset 0) — real on-disk header variants, chosen
# to exercise the detector's PREFIX rules (not byte-for-byte table lookups):
# both JFIF (FFD8FFE0) and EXIF (FFD8FFE1) JPEGs, and ftyp boxes of two
# different sizes (24 and 32 bytes) — a detector that hardcodes one variant
# misclassifies half of these.
MAGIC_SIGNATURES = (
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FFE0"),  # JFIF
    ("jpeg", "FFD8FFE1"),  # EXIF
    ("riff", "52494646"),  # RIFF container (WAV/AVI; subtype at offset 8)
    ("mp4", "0000001866747970"),  # size-24 ftyp box
    ("mp4", "0000002066747970"),  # size-32 ftyp box
)


def with_signed_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Like :func:`with_fake_media` but each payload carries a REAL
    container signature (cycled by id) ahead of the md5 body — so the
    sniffing path below exercises the actual byte patterns a media lake
    contains, without needing any codec library."""
    sigs = F.array(*[F.lit(h) for _, h in MAGIC_SIGNATURES])
    sig_hex = F.element_at(
        sigs,
        (F.pmod(F.col(id_col), F.lit(len(MAGIC_SIGNATURES))) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.to_binary(F.concat(sig_hex, F.md5(F.col(text_col))), F.lit("hex")).alias(
            "media"
        ),
    )


def sniff_media_type(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pre-decode dispatch: detect the container format from the payload's
    leading bytes (magic numbers) — pure Catalyst byte/hex expressions, no
    Python, no codec. This is the step a 100 TB media pipeline runs FIRST:
    route each blob to the right decoder (or quarantine) by prefix, so
    only matching payloads reach the expensive Arrow decode stage, and
    corrupt/mislabeled blobs are caught at scan bandwidth."""
    head = lambda n: F.hex(F.substring(F.col("media"), 1, n))  # noqa: E731
    # Prefix rules, not full-header equality: JPEG is any FFD8FF-prefixed
    # stream (covers JFIF FFD8FFE0, EXIF FFD8FFE1, and other APPn markers);
    # MP4 is 'ftyp' at bytes 5-8 regardless of the leading box-size word.
    detected = (
        F.when(head(8) == "89504E470D0A1A0A", F.lit("png"))
        .when(head(3) == "FFD8FF", F.lit("jpeg"))
        .when(head(4) == "52494646", F.lit("riff"))
        .when(
            F.hex(F.substring(F.col("media"), 5, 4)) == "66747970",
            F.lit("mp4"),
        )
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        F.col(id_col),
        detected.alias("detected"),
        F.length("media").cast("int").alias("n_bytes"),
        head(8).alias("header_hex"),
    )


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio-curation pre-filter features over real WAV payloads
    (codecs.wav_pcm_features): integer energy / zero-crossing / peak /
    silent-window stats — the cheap screens (dead air, clipping, energy
    floor) a 100 TB audio pipeline runs before any model decode. Same
    Arrow mapInPandas shape as every decoder here."""
    from .codecs import wav_pcm_features

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [wav_pcm_features(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_samples": [s["n_samples"] for s in stats],
                    "energy_sum": [s["energy_sum"] for s in stats],
                    "zero_crossings": [s["zero_crossings"] for s in stats],
                    "peak": [s["peak"] for s in stats],
                    "n_windows": [s["n_windows"] for s in stats],
                    "silent_windows": [s["silent_windows"] for s in stats],
                }
            )

    return df.select(id_col, "media").mapInPandas(
        dec,
        schema=(
            f"{id_col} LONG, n_samples INT, energy_sum LONG, "
            "zero_crossings INT, peak INT, n_windows INT, silent_windows INT"
        ),
    )


def transcode_to_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL format transcoding: decode any supported image payload (PNG
    or JPEG, baseline + progressive, dispatched by magic number) to
    pixels and
    re-encode as PNG — the normalize-to-one-format pass a multimodal
    ingestion pipeline runs so every downstream consumer handles a
    single codec. Pixel-exact by construction (PNG is lossless; the
    JPEG loss already happened at original encode time). Same Arrow
    mapInPandas shape; returns (id, media) with the PNG payload."""
    from .codecs import encode_png_bytes, image_pixels

    def tr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["media"]:
                w, h, ch, pixels = image_pixels(bytes(b))
                out.append(encode_png_bytes(pixels, w, h, ch))
            yield pd.DataFrame({id_col: pdf[id_col].values, "media": out})

    return df.select(id_col, "media").mapInPandas(
        tr, schema=f"{id_col} LONG, media BINARY"
    )


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", grid: int = 8
) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels — the multimodal
    twin of SimHash: decode (PNG or JPEG), integer grayscale
    ``(sum of channels) // channels``, nearest-neighbor downsample to a
    ``grid x grid`` patch (same ``(i * src) // dst`` index rule as
    :func:`resize_images`), then one bit per cell: 1 iff
    ``cell * grid^2 > patch_sum`` (strict, all-integer — no float mean,
    so the hash is engine-portable and exactly oracle-checkable). Bits
    pack MSB-first into two int64 words of 32 bits each (the
    sign-quantization convention), ready for XOR-popcount Hamming
    near-dup joins like :func:`~flux_spark.llm.similarity`'s 1-bit path.

    Near-identical images (recompress, small edits, resize) keep most
    bits; Hamming distance over (hash_w0, hash_w1) buckets or ranks
    candidates without ever re-decoding pixels. Arrow-batched
    mapInPandas; one decode per payload, zero shuffle.
    """
    from .codecs import image_pixels

    cells = grid * grid

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, sums, w0s, w1s = [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf["media"]):
                w, h, ch, data = image_pixels(bytes(payload))
                a = (
                    np.frombuffer(data, dtype=np.uint8)
                    .reshape(h, w, ch)
                    .astype(np.int64)
                )
                gray = a.sum(axis=2) // ch
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                g = gray[np.ix_(ys, xs)].flatten()
                s = int(g.sum())
                bits = (g * cells > s).astype(np.int64)
                w0 = 0
                for b in bits[: cells // 2]:
                    w0 = w0 * 2 + int(b)
                w1 = 0
                for b in bits[cells // 2 :]:
                    w1 = w1 * 2 + int(b)
                ids.append(int(i))
                ws.append(w)
                hs.append(h)
                sums.append(s)
                w0s.append(w0)
                w1s.append(w1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "gray_sum": sums,
                    "hash_w0": w0s,
                    "hash_w1": w1s,
                }
            )

    return df.select(id_col, "media").mapInPandas(
        gen,
        schema=f"{id_col} LONG, width INT, height INT, gray_sum LONG, "
        "hash_w0 LONG, hash_w1 LONG",
    )


def shift_brightness(
    df: DataFrame, delta: int, id_col: str = "doc_id"
) -> DataFrame:
    """Decode -> clamp-add ``delta`` to every sample -> PNG re-encode:
    the controlled perturbation used to exercise perceptual-hash
    stability (a recompress/brightness edit must stay Hamming-near its
    source). Arrow-batched; output schema matches the payload producers
    ((id, media))."""
    from .codecs import encode_png_bytes, image_pixels

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf["media"]:
                w, h, ch, data = image_pixels(bytes(payload))
                a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                a = np.clip(a + delta, 0, 255).astype(np.uint8)
                out.append(encode_png_bytes(a.tobytes(), w, h, ch))
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "media": out}
            )

    return df.select(id_col, "media").mapInPandas(
        gen, schema=f"{id_col} LONG, media BINARY"
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    grid: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: aHash each payload
    (:func:`image_ahash`), band the 64 bits into 8 bytes, bucket-join on
    (band, value), verify with the exact XOR-popcount Hamming distance.
    Pigeonhole: a pair within ``max_hamming`` <= 7 differing bits MUST
    share at least one of the 8 byte-bands, so banding has perfect
    recall at the default threshold — same guarantee structure as
    MinHash-LSH, at image scale one decode per payload then pure integer
    Catalyst (band extraction is arithmetic ``(w // 256^k) % 256``,
    engine-portable; no Python after the hash).

    ``max_bucket_size`` drops degenerate bands (a constant-background
    corpus puts everything in one bucket, the usual LSH skew guard; off
    by default for oracle parity). Returns (id_a, id_b, hamming) with
    id_a < id_b, hamming <= ``max_hamming``.
    """
    h = image_ahash(df, id_col, grid).select(
        F.col(id_col).alias("__id"), "hash_w0", "hash_w1"
    )
    band_vals = F.array(
        *[
            (F.floor(F.col("hash_w0") / F.lit(256 ** k)) % 256).cast("int")
            for k in range(4)
        ],
        *[
            (F.floor(F.col("hash_w1") / F.lit(256 ** k)) % 256).cast("int")
            for k in range(4)
        ],
    )
    b = h.select(
        "__id",
        "hash_w0",
        "hash_w1",
        F.posexplode(band_vals).alias("band", "bval"),
    )
    if max_bucket_size is not None:
        sizes = b.groupBy("band", "bval").agg(F.count("*").alias("__n"))
        b = b.join(
            sizes.where(F.col("__n") <= max_bucket_size).drop("__n"),
            ["band", "bval"],
        )
    left = b.select(
        F.col("band"), F.col("bval"),
        F.col("__id").alias("id_a"),
        F.col("hash_w0").alias("__a0"), F.col("hash_w1").alias("__a1"),
    )
    right = b.select(
        F.col("band"), F.col("bval"),
        F.col("__id").alias("id_b"),
        F.col("hash_w0").alias("__b0"), F.col("hash_w1").alias("__b1"),
    )
    cand = (
        left.hint("shuffle_hash")
        .join(right, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__a0", "__a1", "__b0", "__b1")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("__a0").bitwiseXOR(F.col("__b0")))
        + F.bit_count(F.col("__a1").bitwiseXOR(F.col("__b1")))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# Integer-scaled DCT-II basis for the 8-point transform: C[u][x] =
# round(cos((2x+1)·u·π/16) · 2^14). The SAME literals are embedded in the
# Spark kernel (numpy int64 matmul) and the SQL oracle (nested list
# literal), so the transform is exact integer arithmetic in both engines
# — the hyperplanes()/rp_project trick applied to a fixed orthogonal
# basis instead of a random one.
DCT8_Q14: list[list[int]] = [
    [
        int(round(__import__("math").cos((2 * x + 1) * u
                                          * __import__("math").pi / 16)
                  * 16384))
        for x in range(8)
    ]
    for u in range(8)
]


def image_phash(
    df: DataFrame, id_col: str = "doc_id", grid: int = 8
) -> DataFrame:
    """Perceptual DCT hash (pHash) over REAL decoded pixels — the
    frequency-domain upgrade of :func:`image_ahash`: decode, integer
    grayscale, nearest-neighbor ``grid x grid`` patch (identical front
    end to aHash), then a 2-D integer DCT through the fixed Q14 basis
    ``DCT8_Q14`` and one bit per AC coefficient: 1 iff
    ``coeff * 63 > sum(AC coeffs)`` (strict, all-integer). The DC term
    is EXCLUDED, which is what makes pHash invariant to uniform
    brightness shifts — a global +delta moves only coefficient (0,0) —
    where aHash flips bits near the mean. Bits pack MSB-first into
    (hash_w0: first 31, hash_w1: last 32).

    Magnitude bound: |coeff| <= 8·2^14·(8·2^14·255) < 2^43 and the
    63-term sums stay < 2^49, so the int64 arithmetic is exact and the
    hash oracle-checks bit-for-bit. Arrow-batched mapInPandas; one
    decode per payload, zero shuffle.
    """
    from .codecs import image_pixels

    if grid != 8:
        raise ValueError("phash is defined for the 8x8 DCT basis")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        C = np.array(DCT8_Q14, dtype=np.int64)
        for pdf in batches:
            ids, ws, hs, w0s, w1s = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf["media"]):
                w, h, ch, data = image_pixels(bytes(payload))
                a = (
                    np.frombuffer(data, dtype=np.uint8)
                    .reshape(h, w, ch)
                    .astype(np.int64)
                )
                gray = a.sum(axis=2) // ch
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                g = gray[np.ix_(ys, xs)]  # g[y][x]
                r = g @ C.T  # r[y][v] = sum_x g[y][x] * C[v][x]
                d = C @ r  # d[u][v] = sum_y C[u][y] * r[y][v]
                flat = d.flatten()  # u-major
                ac = flat[1:]
                s = int(ac.sum())
                bits = (ac * 63 > s).astype(np.int64)
                w0 = 0
                for b in bits[:31]:
                    w0 = w0 * 2 + int(b)
                w1 = 0
                for b in bits[31:]:
                    w1 = w1 * 2 + int(b)
                ids.append(int(i))
                ws.append(w)
                hs.append(h)
                w0s.append(w0)
                w1s.append(w1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "hash_w0": w0s,
                    "hash_w1": w1s,
                }
            )

    return df.select(id_col, "media").mapInPandas(
        gen,
        schema=f"{id_col} LONG, width INT, height INT, "
        "hash_w0 LONG, hash_w1 LONG",
    )


JPEG_META_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "n_quant_tables int, n_huffman_tables int, restart_interval int, "
    "quant_sum bigint, sof_kind string, sampling string, orientation int"
)


def jpeg_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Header-only JPEG profiling over the Arrow mapInPandas plumbing —
    marker walk stops at SOS (no entropy decode / IDCT), so a corpus of
    billions of images is characterized at a few hundred bytes read per
    file. Same quarantine contract as decode (structural corruption
    raises)."""
    from .codecs import jpeg_header_metadata

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [jpeg_header_metadata(bytes(b)) for b in pdf["media"]]
            out = {id_col: pdf[id_col].values}
            for k in (
                "width",
                "height",
                "channels",
                "n_quant_tables",
                "n_huffman_tables",
                "restart_interval",
                "quant_sum",
                "sof_kind",
                "sampling",
                "orientation",
            ):
                out[k] = [s[k] for s in stats]
            yield pd.DataFrame(out)

    return df.select(id_col, "media").mapInPandas(
        meta, schema=JPEG_META_SCHEMA
    )


def with_mixed_jpeg_media(
    df: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Attach a MIXED JPEG corpus per row — the shape a real image crawl
    has (r9): id % 3 == 0 -> grayscale baseline, 1 -> 4:2:0 color
    baseline, 2 -> progressive 4:2:0 (since r10 a REAL decodable SOF2
    file, not a header stub — every class in the census corpus is now
    decodable). Still the fixture for measuring what fraction of a
    corpus each decode path covers."""
    from .codecs import (
        synth_jpeg420_bytes,
        synth_jpeg_bytes,
        synth_jpeg_progressive_bytes,
    )

    seed_col = seed_col or id_col
    makers = [synth_jpeg_bytes, synth_jpeg420_bytes, synth_jpeg_progressive_bytes]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "media": [
                        makers[int(s) % 3](int(s)) for s in pdf[seed_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} LONG, media BINARY"
    )
