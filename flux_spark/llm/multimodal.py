"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, width/height or sample-rate, n_bytes). The
Spark-side plumbing — schema, Arrow-batched mapInPandas decode, partition
sizing — is real and tested; the actual codec calls are STUBBED because
image/audio libraries are not in this container:

* :func:`decode_image` / :func:`decode_audio` / :func:`sample_frames`
  raise ``NotImplementedError`` with the exact integration point named.
* :func:`byte_features` is the deterministic fake decoder used by tests
  and the oracle gate: per-payload byte statistics computed vectorized in
  pandas — the same batch shape a real decoder would use.

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
# real-codec integration points (stubbed: no image/audio libs in container)
# ---------------------------------------------------------------------------


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """STUB — real implementation plugs PIL/cv2 into the mapInPandas loop
    of :func:`byte_features` and returns (id, height, width, channels,
    pixel_mean). The Spark plumbing is identical; only the per-payload
    function changes."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use byte_features() for the plumbing-equivalent deterministic path"
    )


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """STUB — soundfile/librosa decode into (id, duration_s, rms)."""
    raise NotImplementedError(
        "audio codecs not available in this environment; "
        "use byte_features() for the plumbing-equivalent deterministic path"
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling (ffmpeg/pyav) producing one row per
    sampled frame: (id, frame_idx, frame_bytes). posexplode over the
    decoded frame list keeps it one narrow mapInPandas + explode."""
    raise NotImplementedError(
        "video codecs not available in this environment"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — batched resize; same mapInPandas shape as byte_features."""
    raise NotImplementedError(
        "image codecs not available in this environment"
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
