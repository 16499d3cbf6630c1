"""Capture per-round before/after formatted plans for the judge artifacts.

Writes ``plans/r{N}/<query>_<suffix>.txt`` with ``explain("formatted")``
output for the given queries (default: the bench HEADLINE set) at
$SPARK_GRAFT_SF_DIR (default sf0.1). Round 11 established the layout;
run with suffix=before at the START of an optimization round and
suffix=after for every touched query before closing.

Note: a query that materializes an intermediate (iter_materialize)
executes that subtree eagerly during plan construction, so its scans
appear only in captures taken BEFORE the materialization was added —
the after-capture's consumers read `Scan ExistingRDD`. Count executed
scans with tools/scan_audit.py, which sees the same thing.

Usage: python tools/dump_round_plans.py <round> <suffix> [q1,q2,...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythonmapreduce_spark.plans import registry  # noqa: E402
from pythonmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    rnd, suffix = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        names = sys.argv[3].split(",")
    else:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", f"r{rnd}"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"plans-r{rnd}")
    registry.load_all()
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — survey must not die mid-sweep
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            f.write(text)
        print(name, "ok", len(text))
    return 0


if __name__ == "__main__":
    sys.exit(main())
