"""Capture .explain("formatted") for named registry queries to files.

Usage: python scripts/explain_query.py <sf_dir> <name[,name...]> <out_dir> [suffix]

Writes <out_dir>/<name>_<suffix>.txt (suffix default "after") with the
formatted physical plan of each named __spark_entry__ query. Run from any
checkout (repo root is derived from this file's location) so the same
script captures before-plans from a pinned worktree and after-plans from
HEAD.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    out_dir = sys.argv[3]
    suffix = sys.argv[4] if len(sys.argv) > 4 else "after"
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from flux_spark.session import get_spark

    spark = get_spark(
        "explain-query", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"[{name}] -> {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
