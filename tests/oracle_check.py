"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, column names, and values (columns sorted by name,
rows sorted by all columns). Floats are compared exactly first and with a
1e-9 relative tolerance as a diagnostic — the queries are designed to be
bit-identical, so any non-exact match is flagged.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df):
    """pandas frame -> (colnames, list-of-rows) canonical form."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(v)
            elif hasattr(v, "isoformat"):  # timestamps
                row.append(pd.Timestamp(v).isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                row.append(tuple(v))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return list(df.columns), rows


def rows_equal(a, b, rel_tol=0.0):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb and not math.isclose(va, vb, rel_tol=rel_tol, abs_tol=rel_tol):
                    return False
            elif va != vb:
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from flux_spark.session import get_spark

    spark = get_spark(
        "oracle-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    from flux_spark.analytics.registry import TABLES

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out = fn(spark, sf_dir)
            # driver-canonicalizer contract (VERDICT r5 #2): the driver
            # sorts result rows by ALL columns via pandas, which dies on
            # list/dict cells — a top-level array/map column makes the
            # query permanently ungradeable regardless of correctness
            bad_cols = [
                f.name
                for f in out.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad_cols:
                results[name] = (
                    f"DRIVER-UNSORTABLE OUTPUT: columns {bad_cols} are "
                    f"array/map/struct — flatten (posexplode / to_json)"
                )
                print(f"[{name}] {results[name]}")
                continue
            sdf = out.toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {type(e).__name__}: {e}"
            print(f"[{name}] SPARK ERROR: {e}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows, {spark_s:.1f}s)"
            print(f"[{name}] rows-only: {len(sdf)} rows  ({spark_s:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {e}"
            print(f"[{name}] ORACLE ERROR: {e}")
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if scols != ocols:
            results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif rows_equal(srows, orows):
            results[name] = f"OK exact ({len(srows)} rows, {spark_s:.1f}s)"
        elif rows_equal(srows, orows, rel_tol=1e-9):
            results[name] = f"OK approx-only ({len(srows)} rows) — NOT bit-exact, fix!"
        else:
            diffs = [
                (i, ra, rb)
                for i, (ra, rb) in enumerate(zip(srows, orows))
                if not rows_equal([ra], [rb], rel_tol=1e-9)
            ][:3]
            results[name] = f"VALUE MISMATCH ({len(srows)} rows); first diffs: {diffs}"
        print(f"[{name}] {results[name]}")

    print("\n=== SUMMARY ===")
    bad = 0
    for name, r in sorted(results.items()):
        flag = "PASS" if r.startswith(("OK exact", "rows-only")) else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {name}: {r[:160]}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    import pandas as pd  # noqa: F401

    main()
