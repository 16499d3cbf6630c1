#!/usr/bin/env python3
"""Adjudicate one bench run against a reference run, mechanically.

Codifies the cross-run comparison procedure BASELINE.md's run-history
table has applied by hand since round 6 (VERDICT r08 item 2):

1. **Uniform-elevation estimate** — the MEDIAN of per-query time ratios
   (candidate / reference) over the queries present in both runs. A
   hypervisor-degraded boot elevates everything by a near-constant
   factor (measured 1.2-1.45 across rounds 7-8), so the median ratio is
   the machine-state estimator; code regressions are isolated, not
   uniform.
2. **Outlier list** — queries whose ratio exceeds the uniform estimate
   by >=25% AND whose absolute excursion is >=0.15 s (tiny sub-0.2 s
   queries jitter multiples without meaning). Each outlier is
   classified **touched/untouched** from a git range (defaulting to the
   last driver round-close commit vs the working tree, so the
   classification is never silently skipped); "touched" means ANY
   engine module in the query's defining file's top-level transitive
   import closure changed, so shared-helper edits classify correctly. A
   multi-second outlier on UNTOUCHED code at elevated steal is
   hypervisor noise by construction (the roaming-outlier signature,
   BASELINE.md runs 19-21/31-32/34/44); an outlier on TOUCHED code is a
   candidate real regression and must be settled same-round.
3. **Steal embedding** — `protocol.steal_ticks_delta` from each run
   (/proc/stat, 100 ticks = 1 stolen CPU-second).
4. **Normalized headline** — candidate total / uniform elevation: the
   "what this code would read on the reference run's machine state"
   figure (the "~35.5 s normalized" style entries in the run table).

Input files may be raw ``bench.py`` stdout, a file whose last line is
the bench JSON, or a driver ``BENCH_r{N}.json`` wrapper whose ``tail``
field embeds (possibly front-truncated) bench stdout — for truncated
tails the per-query dicts are recovered field-by-field by regex, so a
driver row whose median dict was cut still adjudicates on the complete
``queries_min`` dict.

Stat preference: min/min when both runs carry ``queries_min``
(burst-robust), else candidate-min vs reference-median (exactly how the
published run-37/38 ratios were computed: BENCH_r07 queries_min over
BENCH_r06 medians reproduces the in-table 1.84x/1.54x/1.53x), else
median/median.

Usage:
    python tools/bench_adjudicate.py CANDIDATE.json REFERENCE.json \
        [--diff r08tag..HEAD] [--repo /root/repo] [--json]
"""
from __future__ import annotations

import argparse
import json
import re
import statistics
import subprocess
import sys
from pathlib import Path

# Absolute floor (seconds) below which a ratio excursion is jitter, and
# the multiplicative margin over the uniform estimate that makes a query
# an outlier. Chosen to reproduce the hand adjudications in BASELINE.md
# runs 37-44 (see tests/test_bench_adjudicate.py).
ABS_FLOOR_S = 0.15
OUTLIER_MARGIN = 1.25


def parse_bench(path: str | Path) -> dict:
    """Extract bench fields from a bench stdout file or driver wrapper.

    Returns {"value", "value_min", "queries", "queries_min", "steal",
    "stat", "sf"} with missing pieces as None/{} — front-truncated
    driver tails lose part of the LEADING dict but keep the rest, and
    that is recovered. Handles both bench line formats: the pre-r11
    spaced JSON starting at ``{"metric"`` and the r11+ compact JSON
    starting at ``{"queries"`` (reordered so truncation eats median
    entries, not the headline scalars/min dict/protocol).
    """
    text = Path(path).read_text()
    # Driver wrapper: the bench stdout lives in the "tail" field.
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except ValueError:
        pass

    out: dict = {
        "value": None,
        "value_min": None,
        "queries": {},
        "queries_min": {},
        "steal": None,
        "stat": None,
        "sf": None,
    }
    # Fast path: a complete JSON line starting at the last payload-open
    # anchor (pre-r11 lines open with {"metric", r11+ with {"queries").
    start = max(text.rfind('{"metric"'), text.rfind('{"queries"'))
    if start != -1:
        line = text[start:].splitlines()[0]
        try:
            d = json.loads(line)
            out["value"] = d.get("value")
            out["value_min"] = d.get("value_min")
            out["queries"] = d.get("queries") or {}
            out["queries_min"] = d.get("queries_min") or {}
            proto = d.get("protocol") or {}
            out["steal"] = proto.get("steal_ticks_delta")
            out["stat"] = proto.get("stat")
            out["sf"] = d.get("sf")
            return out
        except ValueError:
            pass  # truncated line — fall through to field recovery

    def grab_dict(key: str) -> dict[str, float]:
        m = re.search(rf'"{key}":\s*\{{([^}}]*)\}}', text)
        if not m:
            return {}
        return {
            q: float(v)
            for q, v in re.findall(r'"([^"]+)":\s*([\d.]+)', m.group(1))
        }

    def grab_num(key: str) -> float | None:
        # last occurrence wins (warmup chatter can mention e.g. "sf")
        ms = re.findall(rf'"{key}":\s*([\d.]+)', text)
        return float(ms[-1]) if ms else None

    out["queries"] = grab_dict("queries")
    out["queries_min"] = grab_dict("queries_min")
    out["value"] = grab_num("value")
    out["value_min"] = grab_num("value_min")
    steal = grab_num("steal_ticks_delta")
    out["steal"] = int(steal) if steal is not None else None
    out["sf"] = grab_num("sf")
    return out


def pick_stat(cand: dict, ref: dict) -> tuple[dict, dict, str]:
    """Choose comparable per-query dicts (see module docstring)."""
    if cand["queries_min"] and ref["queries_min"]:
        return cand["queries_min"], ref["queries_min"], "min/min"
    if cand["queries_min"] and ref["queries"]:
        return cand["queries_min"], ref["queries"], "min/median"
    return cand["queries"], ref["queries"], "median/median"


def query_defining_files(repo: Path, names: list[str]) -> dict[str, str]:
    """Map query name -> repo-relative defining file, by static scan.

    The registry idiom is ``@register("name", ...)\ndef name(...)`` so a
    file containing ``def <name>(`` is the definer; fall back to the
    file mentioning the quoted name in a register call. Static (no
    pyspark import) so the tool runs anywhere.
    """
    files = sorted((repo / "pythonmapreduce_spark").rglob("*.py"))
    contents = {f: f.read_text() for f in files}
    out: dict[str, str] = {}
    for name in names:
        definer = next(
            (f for f in files if re.search(rf"\ndef {re.escape(name)}\(", contents[f])),
            None,
        )
        if definer is None:
            definer = next(
                (
                    f
                    for f in files
                    if re.search(
                        rf'register\(\s*"{re.escape(name)}"', contents[f]
                    )
                ),
                None,
            )
        if definer is not None:
            out[name] = str(definer.relative_to(repo))
    return out


def module_import_closure(repo: Path) -> dict[str, set[str]]:
    """Repo-relative engine file -> the engine files it TRANSITIVELY
    imports at module top level, including itself.

    A query is "touched" by a diff when ANY file in its defining file's
    closure changed — a regression introduced by editing a shared helper
    (e.g. operators/quantiles.py used by a query defined in
    operators/aggregates.py) must not classify as 'untouched' (VERDICT
    r09 ADVICE, medium). Only TOP-LEVEL ``from pythonmapreduce_spark...``
    / ``import pythonmapreduce_spark...`` statements count: deferred
    function-body imports (the registry.load_all idiom) would otherwise
    make the registry depend on every query module and the
    classification vacuous. Deferred helper imports a definer might use
    are covered by the unattributed-changed-modules warning instead.
    """
    pkg = repo / "pythonmapreduce_spark"
    files = sorted(pkg.rglob("*.py"))
    rel = {f: str(f.relative_to(repo)) for f in files}
    mod_file: dict[str, str] = {}
    for f in files:
        dotted = rel[f][:-3].replace("/", ".")
        if f.name == "__init__.py":
            dotted = dotted.rsplit(".__init__", 1)[0]
        mod_file[dotted] = rel[f]

    direct: dict[str, set[str]] = {r: set() for r in rel.values()}
    imp_re = re.compile(
        r"^(?:from\s+(pythonmapreduce_spark[\w.]*)\s+import\s+"
        r"(\([^)]*\)|[^\n#]+)|import\s+(pythonmapreduce_spark[\w.]*))",
        re.M,
    )
    for f in files:
        for m in imp_re.finditer(f.read_text()):
            base = m.group(1) or m.group(3)
            if base in mod_file:
                direct[rel[f]].add(mod_file[base])
            if m.group(2):
                names = m.group(2).strip("()").replace("\n", " ")
                for item in names.split(","):
                    leaf = item.split(" as ")[0].strip()
                    sub = f"{base}.{leaf}"
                    if leaf and sub in mod_file:
                        direct[rel[f]].add(mod_file[sub])

    closure: dict[str, set[str]] = {}
    for start in direct:
        seen, stack = {start}, [start]
        while stack:
            for dep in direct.get(stack.pop(), ()):
                if dep not in seen:
                    seen.add(dep)
                    stack.append(dep)
        closure[start] = seen
    return closure


def default_diff_range(repo: Path) -> str | None:
    """The round boundary: the last driver round-close commit.

    The driver closes each round with a ``round N: verdict/advice/
    correctness/bench`` commit, so that commit is "the code the last
    bench reference ran on"; diffing that SINGLE rev (git diffs a single
    rev against the working tree) also classifies this round's
    uncommitted work as touched. Returns None (no classification) when
    no such commit exists — e.g. a fresh clone with rewritten history.
    """
    res = subprocess.run(
        ["git", "log", "-E", "--grep", r"^round [0-9]+:", "-n", "1", "--format=%H"],
        cwd=repo,
        capture_output=True,
        text=True,
    )
    h = res.stdout.strip()
    return h if res.returncode == 0 and h else None


def changed_files(repo: Path, diff_range: str) -> set[str]:
    res = subprocess.run(
        ["git", "diff", "--name-only", diff_range],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    )
    return {ln.strip() for ln in res.stdout.splitlines() if ln.strip()}


def adjudicate(
    cand: dict,
    ref: dict,
    touched_files: set[str] | None = None,
    repo: Path | None = None,
) -> dict:
    cq, rq, stat = pick_stat(cand, ref)
    shared = sorted(set(cq) & set(rq))
    ratios = {q: cq[q] / rq[q] for q in shared if rq[q] > 0}
    uniform = statistics.median(ratios.values()) if ratios else None

    # touched = ANY engine module in the defining file's top-level
    # transitive import closure changed, not just the definer itself
    # (shared-helper regressions must not classify 'untouched').
    definer: dict[str, str] = {}
    closure: dict[str, set[str]] = {}
    unattributed_changed: list[str] = []

    def is_touched(q: str) -> bool:
        # Defined unconditionally: with touched_files but no repo (library
        # callers), fall back to definer-only matching — which with an
        # empty definer map classifies everything untouched, the pre-r10
        # graceful degradation (VERDICT r10 ADVICE, low).
        d = definer.get(q)
        return bool(d and closure.get(d, {d}) & (touched_files or set()))

    if touched_files is not None and repo is not None:
        definer = query_defining_files(repo, shared)
        closure = module_import_closure(repo)

        attributed: set[str] = set()
        for q in shared:
            d = definer.get(q)
            if d:
                attributed |= closure.get(d, {d})
        unattributed_changed = sorted(
            f
            for f in touched_files
            if f.startswith("pythonmapreduce_spark/")
            and f.endswith(".py")
            and f not in attributed
        )

    outliers = []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if (
            uniform
            and r >= uniform * OUTLIER_MARGIN
            and (cq[q] - rq[q] * uniform) >= ABS_FLOOR_S
        ):
            entry = {
                "query": q,
                "ratio": round(r, 3),
                "cand_s": cq[q],
                "ref_s": rq[q],
            }
            if touched_files is not None:
                entry["touched"] = is_touched(q)
            outliers.append(entry)

    touched_ratios = {}
    if touched_files:
        touched_ratios = {
            q: round(ratios[q], 3)
            for q in shared
            if q in ratios and is_touched(q)
        }

    cand_total = cand["value_min"] or cand["value"]
    result = {
        "stat": stat,
        "n_shared": len(shared),
        "uniform_elevation": round(uniform, 3) if uniform else None,
        "candidate_total_s": cand_total,
        "candidate_median_total_s": cand["value"],
        "normalized_total_s": (
            round(cand_total / uniform, 2) if uniform and cand_total else None
        ),
        "steal_candidate": cand["steal"],
        "steal_reference": ref["steal"],
        "stolen_cpu_s_candidate": (
            round(cand["steal"] / 100.0, 1) if cand["steal"] is not None else None
        ),
        "outliers": outliers,
        "touched_query_ratios": touched_ratios,
        "unattributed_changed_modules": unattributed_changed,
    }
    # The human verdict line the run table wants: roaming outliers on
    # untouched code at elevated steal = machine; touched outlier = real.
    untouched_out = [o for o in outliers if o.get("touched") is False]
    touched_out = [o for o in outliers if o.get("touched") is True]
    if touched_out:
        verdict = (
            "TOUCHED-code outlier(s) present — settle same-round: "
            + ", ".join(f"{o['query']} {o['ratio']}x" for o in touched_out)
        )
    elif untouched_out:
        verdict = (
            "all outliers on UNTOUCHED code (roaming-outlier signature "
            "=> machine, not plans): "
            + ", ".join(f"{o['query']} {o['ratio']}x" for o in untouched_out)
        )
    elif outliers:
        verdict = "outliers present; pass --diff to classify touched/untouched"
    else:
        verdict = "no per-query outlier — any headline shift is uniform machine state"
    result["verdict"] = verdict
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("candidate")
    ap.add_argument("reference")
    ap.add_argument(
        "--diff",
        help="git range for touched/untouched classification; defaults to "
        "the last 'round N:' driver commit vs the working tree (pass "
        "--no-diff to suppress)",
    )
    ap.add_argument(
        "--no-diff",
        action="store_true",
        help="skip touched/untouched classification entirely",
    )
    ap.add_argument("--repo", default=str(Path(__file__).resolve().parent.parent))
    ap.add_argument("--json", action="store_true", help="machine output only")
    args = ap.parse_args()

    repo = Path(args.repo)
    cand, ref = parse_bench(args.candidate), parse_bench(args.reference)
    diff_range = None
    if not args.no_diff:
        # classification must never be silently skipped (VERDICT r09
        # item 3): a single rev diffs against the working tree, so
        # uncommitted round work classifies as touched too.
        diff_range = args.diff or default_diff_range(repo)
    touched = changed_files(repo, diff_range) if diff_range else None
    res = adjudicate(cand, ref, touched_files=touched, repo=repo)
    res["diff_range"] = diff_range

    if args.json:
        print(json.dumps(res))
        return 0
    u = res["uniform_elevation"]
    print(f"stat: {res['stat']}  shared queries: {res['n_shared']}")
    print(
        f"uniform elevation (median per-query ratio): {u}x"
        f"  | steal cand/ref: {res['steal_candidate']}/{res['steal_reference']}"
        f" ticks (~{res['stolen_cpu_s_candidate']} stolen CPU-s)"
    )
    print(
        f"candidate total: {res['candidate_total_s']} s"
        f"  => normalized ~{res['normalized_total_s']} s at reference machine state"
    )
    if res["outliers"]:
        print("outliers (ratio >= uniform*1.25 and >=0.15s excess):")
        for o in res["outliers"]:
            t = o.get("touched")
            tag = "TOUCHED" if t else ("untouched" if t is False else "unclassified")
            print(
                f"  {o['query']}: {o['ratio']}x ({o['ref_s']} -> {o['cand_s']} s) [{tag}]"
            )
    if res["touched_query_ratios"]:
        print(f"touched-code ratios: {res['touched_query_ratios']}")
    if res["unattributed_changed_modules"]:
        print(
            "warning: changed engine modules not in any bench query's import "
            f"closure (check by hand): {res['unattributed_changed_modules']}"
        )
    print(f"verdict: {res['verdict']}")
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
