"""Duplicated-subtree audit: count parquet scans per input table in every
registered query's physical plan and flag plans that read a table more
often than a small per-query allowance.

A Catalyst plan re-executes a shared DataFrame subtree once PER CONSUMER
unless the query materializes it (plans/materialize.iter_materialize) or
the planner happens to insert a ReusedExchange — so "documents scanned
24x" (tfidf_cosine_pairs before round 11) is invisible in the code and
obvious in the plan. This sweep is how round 11 found the tfidf/
basket_rules/semdedup re-derivation family; it stays in tools/ so later
rounds can re-run it after adding queries.

Usage: python tools/scan_audit.py [--min-scans N] [--names a,b,c]
Prints one line per (query, table) at or above the threshold, highest
count first. Exit code is always 0 — it is a survey, not a gate (some
multi-scans are deliberate: profile_columns' per-column pruned scans,
TPC-H Q21's three lineitem reads; see the allowlist rationale in
tools/audit_plans.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythonmapreduce_spark.plans import registry  # noqa: E402
from pythonmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-scans", type=int, default=4)
    ap.add_argument("--names", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    spark = get_spark("scan-audit")
    registry.load_all()
    names = args.names.split(",") if args.names else sorted(registry.QUERIES)
    rows = []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — survey must not die mid-sweep
            print(f"{name}: EXPLAIN FAILED {exc!r}", file=sys.stderr)
            continue
        # Count SCAN NODES, not raw ".parquet" mentions (round 12): the
        # formatted plan repeats a file's Location string in ReusedExchange
        # /subquery reprints, which over-counted. Each physical scan gets
        # exactly one "(N) Scan parquet" detail block (blank-line
        # separated, including inside the Subqueries section); its
        # Location line names the table.
        counts: dict[str, int] = {}
        for block in plan.split("\n\n"):
            if not re.match(r"\(\d+\) Scan parquet", block.lstrip()):
                continue
            m = re.search(r"/(\w+)\.parquet", block)
            if m:
                t = m.group(1)
                counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            if c >= args.min_scans:
                rows.append((c, name, t))
    for c, name, t in sorted(rows, reverse=True):
        print(f"{c:3d}  {name}  ({t})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
