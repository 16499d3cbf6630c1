#!/usr/bin/env python3
"""Standalone micro-bench for the chronic bench noise-magnet queries.

The gated queries have each been "adjudicated hypervisor noise" in
two-plus rounds (r06/r08/r09 run tables) — every excursion so far was
settled CROSS-round by an independent re-measurement landing back in
band. This gate settles an excursion SAME-round (VERDICT r08 item 3):
~40 s total, 2 warmups + 5 timed runs per query, reporting the MIN (the
burst-robust statistic: a steal burst can slow a run, nothing can speed
one up past the engine's floor) against the published BASELINE.md
per-query band.

Why these five are the noise magnets, mechanically:
- dedup_unicode_normalized: a single ArrowEvalPython stage over a
  text-only scan — per-stage timing is dominated by one Python worker
  round-trip, the documented noisiest stage type in the set.
- tokenizer_roundtrip: k sequential codegen'd replaces — long dependent
  stage chain, no parallel slack to absorb a stolen tick.
- stream_stream_left_join: 4-partition symmetric-hash state, two-sided
  watermarks — state-store commits are the most contention-sensitive
  operation in the engine (serialized RocksDB-style commit barriers).
- auc_roc / join_asof_nearest (added per VERDICT r09): both run a
  SinglePartition-window stage — one task, zero parallel slack, the
  steal-sensitive stage class; each was an r09 driver-bench outlier on
  untouched code that three independent judge sessions adjudicated
  machine.

Exit code 0 when every query's min lands at-or-under its band top AND
at-or-above its band floor. A min ABOVE band top under no active storm
is a real regression (machine elevation shows in the steal delta; pass
--factor to widen for measured-degraded boots) -> exit 1. A min BELOW
the band FLOOR is suspicious the other way — a broken or accidentally
pruned plan returning early reads as "fast" — and exits 2 so it is
never silently read as a pass (VERDICT r09 ADVICE). The floor is NOT
scaled by --factor: steal can only slow a run.

Band staleness: the BANDS constants are hand-copies of the BASELINE.md
per-query band table (the three originals from the round-5/6 rows;
auc_roc and join_asof_nearest from their round-7/round-4 rows) — a
BASELINE.md band update must be mirrored here, and the citation comment
on each entry says which row to diff against.

Session warmth: the bands are WARM-SESSION numbers — bench.py measures
each magnet after ~48 other queries have run in the same JVM. A fresh
session plateaus structurally higher (round-10 experiment at steal 86:
dedup_unicode_normalized leveled at ~0.48 after FIFTEEN runs vs its
0.36 band top and its 0.345 same-day warm-bench reading; tokenizer at
~1.29 vs 1.0 / 1.157 — deep JIT + Python-worker/page-cache warmth the
2-per-query warmups can't reproduce). The gate therefore runs a
bench-like WARM-UP MIX of other registry queries first (disable with
--no-warm-mix to reproduce the historical fresh-session readings,
which ran 1.3-1.5x band at near-zero steal on every boot probed), and
the timed second mix pass yields the DEFAULT band-top factor: the
median mix-query ratio to the newest BENCH_r*.json reference is this
session's machine+warmth elevation, so the gate's verdict is RELATIVE —
"are the magnets elevated beyond what this session does to everything?"
A magnet-specific regression multiplies ON TOP of that factor and still
flags; a uniform whole-engine regression is bench_adjudicate's job, not
this gate's. ~60-75 s total with the mix.

Usage:
    python tools/noise_gate.py [--sf-dir /root/testdata/sf0.1] \
        [--cpus 32] [--runs 5] [--factor F] [--no-warm-mix] [--json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published per-query bands — each a hand-copy of the named BASELINE.md
# per-query band table row; update in lockstep with that table.
BANDS: dict[str, tuple[float, float]] = {
    # "dedup_unicode_normalized (NFC pass + digest accounting)" row: 0.26-0.36 s
    "dedup_unicode_normalized": (0.26, 0.36),
    # "tokenizer_roundtrip (decode∘encode identity)" row: 0.8-1.0 s
    "tokenizer_roundtrip": (0.8, 1.0),
    # "stream_stream_left_join (outer interval join, watermark eviction)"
    # row: 2.0-2.4 s
    "stream_stream_left_join": (2.0, 2.4),
    # "auc_roc (exact Mann-Whitney, collapse-by-score)" row: 0.23-0.31 s
    # (added per VERDICT r09 item 2 — chronic SinglePartition-window magnet)
    "auc_roc": (0.23, 0.31),
    # "window_named_clause / join_asof_nearest" row: 0.35-0.45 s
    # (added per VERDICT r09 item 2)
    "join_asof_nearest": (0.35, 0.45),
}

# Bench-like session warm-up: a cheap cross-section of the bench set
# (join/agg/window/text/Arrow/embedding stages) run before measuring,
# so the gate's JVM warmth approximates the state in which the BANDS
# were measured. Two passes ≈ 15-20 s at sf0.1. The second pass is
# TIMED: the median ratio of each mix query to its min in the newest
# BENCH_r*.json is this session's machine+warmth elevation — exactly
# bench_adjudicate's uniform-elevation estimator, computed in-session —
# and becomes the default band-top factor, so the gate self-normalizes
# instead of needing a hand-carried --factor. (Storm-elevated BENCH
# references UNDERESTIMATE the factor, making the gate stricter, never
# looser.)
WARM_MIX = (
    "join_star",
    "agg_basic",
    "wordcount",
    "window_rank",
    "dedup_exact",
    "text_stats",
    "knn_cosine",
    "topk",
)


def newest_bench_refs(repo: Path) -> dict[str, float]:
    """Per-query reference seconds from the newest committed BENCH file
    (min stat preferred, median fallback; {} if none parse)."""
    from tools.bench_adjudicate import parse_bench

    benches = sorted(
        repo.glob("BENCH_r*.json"),
        key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
    )
    for f in reversed(benches):
        try:
            parsed = parse_bench(f)
        except (OSError, ValueError):
            continue
        refs = parsed["queries_min"] or parsed["queries"]
        if refs:
            return refs
    return {}


def bands_from_baseline(path: str | Path) -> dict[str, tuple[float, float]]:
    """Re-derive the gated queries' bands from BASELINE.md's per-query
    band table, so the hand-copied BANDS constants carry a mechanical
    staleness check instead of only a citation comment (VERDICT r09
    ADVICE). Row format: ``| name (desc) [/ name2 ...] | LO–HI s [/
    LO2–HI2 s] (...) | ...`` — the i-th '/'-separated name takes the
    i-th leading range. Only rows naming a gated query are read."""
    out: dict[str, tuple[float, float]] = {}
    for line in Path(path).read_text().splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) < 2:
            continue
        # strip parenthetical descriptions before splitting shared rows
        names = [
            n.strip()
            for n in re.sub(r"\([^)]*\)", "", cells[0]).split("/")
        ]
        if not any(n in BANDS for n in names):
            continue
        ranges = re.findall(
            r"(\d+(?:\.\d+)?)\s*[–-]\s*(\d+(?:\.\d+)?)\s*s", cells[1]
        )
        for i, n in enumerate(names):
            if n in BANDS and i < len(ranges):
                out[n] = (float(ranges[i][0]), float(ranges[i][1]))
    return out


def classify(best: float, lo: float, hi: float, factor: float) -> str:
    """'in_band' | 'above' (regression/storm) | 'below' (suspicious-fast).

    The top is widened by ``factor`` on measured-degraded boots; the
    floor never is — steal can only slow a run, so a sub-floor min means
    the plan changed (pruned/broken), not the machine."""
    if best > hi * factor:
        return "above"
    if best < lo:
        return "below"
    return "in_band"


def steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument(
        "--factor",
        type=float,
        default=None,
        help="band-top multiplier for measured-degraded boots (e.g. 1.25 "
        "when the session's bench_adjudicate uniform elevation is ~1.25); "
        "defaults to the warm-mix auto-estimate (1.0 with --no-warm-mix)",
    )
    ap.add_argument(
        "--no-warm-mix",
        action="store_true",
        help="skip the bench-like session warm-up (fresh-session readings "
        "run 1.3-1.5x band even at zero steal; see module docstring)",
    )
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    baseline = Path(__file__).resolve().parent.parent / "BASELINE.md"
    if baseline.exists():
        published = bands_from_baseline(baseline)
        for name, band in published.items():
            if band != BANDS[name]:
                print(
                    f"WARNING: BANDS[{name!r}] = {BANDS[name]} is STALE vs "
                    f"BASELINE.md's {band} — update the constant",
                    file=sys.stderr,
                )

    from pythonmapreduce_spark.plans import registry
    from pythonmapreduce_spark.session import get_spark

    spark = get_spark("noise-gate", cpus=args.cpus)
    registry.load_all()
    spark.range(1000).selectExpr("sum(id)").collect()

    mix_times: dict[str, float] = {}
    if not args.no_warm_mix:
        for timed_pass in (False, True):
            for name in WARM_MIX:
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, args.sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                if timed_pass:
                    mix_times[name] = time.perf_counter() - t0

    factor_source = "cli"
    factor = args.factor
    if factor is None:
        factor, factor_source = 1.0, "none"
        refs = newest_bench_refs(
            Path(__file__).resolve().parent.parent
        ) if mix_times else {}
        ratios = sorted(
            mix_times[n] / refs[n]
            for n in mix_times
            if refs.get(n, 0) > 0
        )
        if ratios:
            factor = round(ratios[len(ratios) // 2], 3)
            factor_source = "auto-mix"

    steal_start = steal_ticks()
    results: dict[str, dict] = {}
    any_above = any_below = False
    for name, (lo, hi) in BANDS.items():
        fn = registry.QUERIES[name]
        for _ in range(args.warmups):
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        best = min(samples)
        verdict = classify(best, lo, hi, factor)
        any_above = any_above or verdict == "above"
        any_below = any_below or verdict == "below"
        results[name] = {
            "min": best,
            "samples": samples,
            "band": [lo, hi],
            "band_top_scaled": round(hi * factor, 3),
            "verdict": verdict,
            "in_band": verdict == "in_band",
        }
    ok = not (any_above or any_below)
    out = {
        "metric": "noise_gate",
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "stat": "min",
        "factor": factor,
        "factor_source": factor_source,
        "steal_ticks_delta": (
            steal_ticks() - steal_start if steal_start >= 0 else -1
        ),
        "queries": results,
        "pass": ok,
    }
    if args.json:
        print(json.dumps(out))
    else:
        for name, r in results.items():
            mark = {"in_band": "OK ", "above": "OUT", "below": "LOW"}[r["verdict"]]
            print(
                f"{mark} {name}: min {r['min']} s vs band {r['band']}"
                f" (x{factor} {factor_source})  samples={r['samples']}"
            )
        if any_below:
            print(
                "WARNING: min BELOW band floor — steal cannot speed a run; "
                "suspect a pruned/broken plan (check tools/check_plan_drift.py)"
            )
        print(
            f"steal_ticks_delta={out['steal_ticks_delta']}  "
            f"pass={ok}"
        )
        print(json.dumps(out))
    # 2 = suspicious-fast (sub-floor) takes precedence: it means the
    # plan itself is suspect, not merely the machine elevated.
    return 2 if any_below else (1 if any_above else 0)


if __name__ == "__main__":
    sys.exit(main())
