"""Capture per-round before/after formatted plans for the judge artifacts.

Writes ``plans/r{N}/<query>_<suffix>.txt`` with ``explain("formatted")``
output for the given queries (default: the bench HEADLINE set) at
$SPARK_GRAFT_SF_DIR (default sf0.1). Round 11 established the layout;
run with suffix=before at the START of an optimization round and
suffix=after for every touched query before closing.

A query that materializes an intermediate (iter_materialize) executes
that subtree eagerly during plan construction, so the final explain only
shows `Scan ExistingRDD` where the work happened. Round 12: the capture
now records those materialization passes FIRST-CLASS — each
iter_materialize call's formatted plan is appended to the artifact as a
"materialization pass" section via plans/materialize.PLAN_CAPTURE, so a
0-scan final plan is never mistaken for free. scan_audit.py still counts
only the final plan's scans.

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
    from pythonmapreduce_spark.plans import materialize

    for name in names:
        passes: list[str] = []
        materialize.PLAN_CAPTURE = passes
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — survey must not die mid-sweep
            text = f"EXPLAIN FAILED: {exc!r}\n"
        finally:
            materialize.PLAN_CAPTURE = None
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            f.write(text)
            for i, p in enumerate(passes, 1):
                f.write(
                    f"\n-- materialization pass {i}/{len(passes)} "
                    "(executed eagerly at query build; its scans do NOT "
                    "appear in the final plan above)\n"
                )
                f.write(p)
        print(name, "ok", len(text), f"+{len(passes)} materialization passes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
