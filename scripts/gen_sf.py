"""Scale the driver's deterministic testdata to a larger scale factor.

Replicates each scaling table FACTOR times with per-replica key offsets, so
every foreign-key relationship of the source data holds inside each replica
(o_custkey -> customer, l_orderkey -> orders, l_partkey/l_suppkey -> part/
supplier, events.user_id density, documents/embeddings ids). Fixed-size
dimensions (region, nation) are copied through unchanged, mirroring TPC-H
(their cardinality is scale-independent).

Payload perturbation keeps the scaled corpus realistic for dedup/ANN:

* documents.text: per-replica letter substitution (length-preserving, so
  ``n_chars`` stays consistent) — replicas are DISTINCT documents, not a
  pathological all-duplicates corpus;
* embeddings: small deterministic per-(vec_id, replica) additive epsilon —
  replicas are near, not identical, vectors.

Everything is pure deterministic SQL over the read-only source parquet —
same data every run, no RNG. Output file layout matches TESTDATA.md
(one ``<table>.parquet`` FILE per table) so tests/oracle_check.py, bench.py
and the DuckDB oracles work unchanged via ``SPARK_GRAFT_SF_DIR``.

Usage: python scripts/gen_sf.py [src_dir] [dst_dir] [factor]
       python scripts/gen_sf.py            # sf0.1 -> .data/sf1, factor 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> (key columns to offset by replica * source cardinality of the
# offset base table). Cardinalities are read from the source, not hardcoded.
KEY_OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_THROUGH = ("region", "nation")

# Row-group sizing: Spark can only split a parquet FILE at rowgroup
# boundaries, and documents/embeddings feed compute-dense narrow chains
# (explode, higher-order exprs) where scan parallelism IS the parallelism.
# A single 50k-row rowgroup would serialize those stages on one core —
# the single-file artifact of this generator, not a real-lake shape, so
# generate lake-like splittability instead.
ROW_GROUP_SIZES = {"documents": 2048, "embeddings": 2048}

# bump when the perturbation/offset scheme changes so stale outputs from an
# older scheme are regenerated even when their row count happens to match
GENERATOR_VERSION = 3


def _manifest(src: str, factor: int) -> dict:
    return {
        "src": os.path.abspath(src),
        "factor": factor,
        "generator_version": GENERATOR_VERSION,
    }


def generate(src: str, dst: str, factor: int) -> None:
    import json

    os.makedirs(dst, exist_ok=True)
    # resume guard (advisor r10): the per-table row-count check alone would
    # silently keep a leftover file from a run with a DIFFERENT src dir or
    # an older perturbation scheme whose count happens to match — pin the
    # (src, factor, generator_version) triple in a manifest and regenerate
    # everything when it disagrees
    manifest_path = os.path.join(dst, "_gen_manifest.json")
    want = _manifest(src, factor)
    have = None
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as fh:
                have = json.load(fh)
        except (OSError, ValueError):
            have = None
    resume_ok = have == want
    if not resume_ok and have is not None:
        print(f"manifest mismatch ({have} != {want}): regenerating all tables")
    # ADVICE r11: the manifest is written only AFTER the generation loop
    # completes — writing it up front meant a scheme-change run killed
    # mid-loop left a matching manifest over stale old-scheme tables
    # (whose row counts equal card[t]*factor, so the count check can't
    # catch them). On mismatch, drop the stale manifest first so an
    # interrupted regen can never be mistaken for a valid resume.
    if not resume_ok and os.path.exists(manifest_path):
        os.remove(manifest_path)
    con = duckdb.connect()
    card: dict[str, int] = {}
    for t in KEY_OFFSETS:
        card[t] = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    # user_id is NOT dense over events: offset by the user-id span instead
    card["__events_users"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    # events.ts must advance per replica, not repeat: event_id offsets grow
    # with r, so a repeated ts range breaks the timestamp-monotone-in-offset
    # property that offsets_for_times-style oracles (log_admin_reset_offsets)
    # rely on. Shift each replica by the source span + 1h of headroom.
    ts_span_s = con.execute(
        f"SELECT date_diff('second', min(ts), max(ts)) + 3600 "
        f"FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]

    for t in COPY_THROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{dst}/{t}.parquet' (FORMAT parquet, COMPRESSION zstd)"
        )
        print(f"{t}: copied through")

    for t, offsets in KEY_OFFSETS.items():
        # deterministic output + replica-count check make reruns resumable:
        # a prior partial run's completed tables are skipped, the table it
        # died on is rewritten (COPY truncates)
        dst_file = f"{dst}/{t}.parquet"
        if resume_ok and os.path.exists(dst_file):
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{dst_file}')"
                ).fetchone()[0]
            except duckdb.Error:
                n = -1  # torn file from a killed run: regenerate
            if n == card[t] * factor:
                print(f"{t}: exists with {n} rows, skipped")
                continue
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
        exprs = []
        for name, typ, *_ in cols:
            if name in offsets:
                base = card[offsets[name]]
                # the offset base is >= every source value of this column
                # (dense keys: the cardinality; user_id: the max+1 span),
                # so base*(factor+1) bounds the largest emitted key — widen
                # INT32 columns whose scaled range outgrows the type
                # (ladder catch at factor=1000: events.event_id overflowed)
                out_typ = typ
                if (
                    typ.upper() in ("INTEGER", "INT", "INT4", "INT32")
                    and base * (factor + 1) >= 2**31
                ):
                    out_typ = "BIGINT"
                exprs.append(
                    f"CAST({name} + r.r * {base} AS {out_typ})"
                    f" AS {name}"
                )
            elif t == "events" and name == "ts":
                # BIGINT microsecond math: the seconds form
                # `(r.r * span) * INTERVAL 1 SECOND` casts the product to
                # INT32 inside DuckDB's interval multiply, which overflows
                # at factor >= ~1000 (second ladder catch at sf100)
                exprs.append(
                    f"CAST(ts + to_microseconds(CAST(r.r AS BIGINT) * "
                    f"{ts_span_s} * 1000000) AS {typ}) AS ts"
                )
            elif t == "documents" and name == "text":
                # length-preserving, replica-distinct text: swap 'e' for a
                # per-replica letter (replica 0 stays byte-identical)
                exprs.append(
                    "CASE WHEN r.r = 0 THEN text ELSE translate(text, 'e', "
                    "chr(103 + CAST(r.r % 20 AS INTEGER))) END AS text"
                )
            elif t == "embeddings" and name == "embedding":
                # deterministic near-duplicate perturbation per replica
                exprs.append(
                    "CAST(list_transform(embedding, x -> x + "
                    "((vec_id * 131 + r.r * 37) % 11 - 5) * 0.01) "
                    "AS FLOAT[]) AS embedding"
                )
            else:
                exprs.append(name)
        rg = (
            f", ROW_GROUP_SIZE {ROW_GROUP_SIZES[t]}"
            if t in ROW_GROUP_SIZES
            else ""
        )
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS r) r "
            "ORDER BY r.r) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet, COMPRESSION zstd{rg})"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {card.get(t)} -> {n}")

    with open(manifest_path, "w") as fh:
        json.dump(want, fh)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), ".data/sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, factor)
