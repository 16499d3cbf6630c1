"""Exact weighted quantiles over the collapsed value distribution.

Spark's exact ``percentile`` aggregate runs as ObjectHashAggregate whose
per-group buffer holds EVERY value until finalization: executor memory
bounds the approach at one group's row count x 8 bytes (a ~2 TB
unspillable buffer per group at the 100 TB target), and the exchange
ships whole-group object buffers to one task per group. The collapsed
form here is the engine's ks_statistic/auc_roc discipline applied to
quantiles:

1. one combine-enabled count per distinct (group, value) — shuffle
   width is |distinct values|, never |rows|;
2. a per-group running count over the value-sorted distincts (window
   sort, which SPILLS via the external sorter instead of OOMing);
3. the quantile_cont selection — the value at 0-based sorted index i is
   the first distinct value whose cumulative count reaches i+1 — for
   floor/ceil(p*(n-1)), then linear interpolation between them.

Exact at any group size and bit-compatible with SQL quantile_cont /
Spark percentile at the call sites' rounding (proven against the DuckDB
oracle by percentile_agg). approx_percentile (t-digest; mergeable,
constant memory) remains the recommended sketch path at scale — this is
the exact twin that now merely gets slow, not impossible.

NULL semantics match the aggregate form: NULL values sort first with a
zero running count (never selected), n counts non-NULL only, and an
all-NULL group yields NULL quantiles but still appears.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    extra: dict[str, Column] | None = None,
    include_n: str | None = None,
) -> DataFrame:
    """One row per group: ``group_cols`` + a double column per ``ps``
    entry (name -> quantile fraction), exact-interpolated.

    ``extra`` aggregates run over the COLLAPSED distinct-(group, value)
    rows, NOT the raw rows — each distinct value appears ONCE regardless
    of its multiplicity. Only dedup-INVARIANT aggregates (``min`` /
    ``max`` / ``any_value`` over the value column) equal their raw-row
    twins; a duplicate-sensitive aggregate (count / sum / avg) must be
    written weight-aware against the carried multiplicity column, e.g.
    ``F.sum(F.col(v) * F.col("_wq_cnt"))`` for the raw-row sum — a bare
    ``F.sum(v)`` would silently sum each value once. ``include_n`` is
    the weight-aware COUNT(value) already (sum of ``_wq_cnt`` over
    non-null values); use it instead of an ``extra`` count.

    ``include_n`` emits the group's non-null RAW-ROW value count under
    that name. Empty ``group_cols`` computes global quantiles (single
    window partition — the same single-task finalization the percentile
    aggregate had, but spillable)."""
    # Guard (not just docs): a duplicate-sensitive extra that ignores the
    # multiplicity column is a silent-wrong-answer bug, so reject it at
    # plan-build time. Column reprs print the unresolved expression
    # (e.g. Column<'sum(latency_s)'>), which is enough to spot the bare
    # duplicate-sensitive forms. Best-effort string heuristic, hardened
    # twice per ADVICE: (a) the alternation covers the order/moment
    # statistics this module exists to replace (median/mode/percentile/
    # skewness/kurtosis/corr/covar_*), not just count/sum/avg/stddev;
    # (b) _wq_cnt must appear INSIDE each matched aggregate call, not
    # merely anywhere in the expression — sum(v) + max(_wq_cnt)*0 is
    # still wrong and still rejected; (c) the multiplicity-sensitive
    # COLLECTION and PRODUCT aggregates (collect_list/array_agg returns
    # one element per RAW row; product/listagg/string_agg multiply or
    # concatenate once per raw occurrence) are in the alternation too —
    # collect_set stays out because a set over the collapsed distincts
    # IS the set over the raw rows.
    for name, col in (extra or {}).items():
        expr = str(col)
        for m in re.finditer(
            r"\b(count|sum|avg|mean|stddev\w*|variance|var_\w+|std|median"
            r"|mode|percentile\w*|skewness|kurtosis|corr|covar_\w+"
            r"|collect_list|array_agg|product|listagg|string_agg)\(",
            expr,
        ):
            depth, i = 1, m.end()
            while i < len(expr) and depth:
                if expr[i] == "(":
                    depth += 1
                elif expr[i] == ")":
                    depth -= 1
                i += 1
            if "_wq_cnt" not in expr[m.end() : i - 1]:
                raise ValueError(
                    f"extra aggregate {name!r} ({expr}) has a duplicate-"
                    f"sensitive call {m.group(1)}(...) over the COLLAPSED "
                    "distinct-value rows without the _wq_cnt multiplicity "
                    "inside it; weight it by _wq_cnt (e.g. sum(v * _wq_cnt)) "
                    "or use include_n. (Best-effort string check — it cannot "
                    "prove a weight-aware expression is ARITHMETICALLY "
                    "correct, only that the multiplicity was consulted.)"
                )
    v = F.col(value_col)
    counts = df.groupBy(*(group_cols + [value_col])).agg(
        F.count(F.lit(1)).alias("_wq_cnt")
    )
    nn_cnt = F.when(v.isNotNull(), F.col("_wq_cnt")).otherwise(F.lit(0))
    part = [F.col(c) for c in group_cols] if group_cols else [F.lit(1)]
    wgrp = W.partitionBy(*part)
    word = wgrp.orderBy(v.asc_nulls_first())
    cum = counts.withColumn("_wq_cum", F.sum(nn_cnt).over(word)).withColumn(
        "_wq_n", F.sum(nn_cnt).over(wgrp)
    )

    def pick(p: float, edge) -> Column:
        idx = edge(F.lit(p) * (F.col("_wq_n") - F.lit(1)))
        return F.min(F.when(F.col("_wq_cum") >= idx + 1, v))

    aggs = [F.max("_wq_n").alias("_wq_n")]
    for name, p in ps.items():
        aggs.append(pick(p, F.floor).alias(f"_wq_{name}_lo"))
        aggs.append(pick(p, F.ceil).alias(f"_wq_{name}_hi"))
    for name, col in (extra or {}).items():
        aggs.append(col.alias(name))
    res = cum.groupBy(*group_cols).agg(*aggs)

    out = [F.col(c) for c in group_cols]
    if include_n:
        # empty GLOBAL input still produces one aggregate row (max over
        # zero rows = NULL) — a count must read 0 there, like COUNT(*).
        out.append(F.coalesce(F.col("_wq_n"), F.lit(0)).alias(include_n))
    for name, p in ps.items():
        h = F.lit(p) * (F.col("_wq_n") - F.lit(1))
        lo, hi = F.col(f"_wq_{name}_lo"), F.col(f"_wq_{name}_hi")
        out.append((lo + (h - F.floor(h)) * (hi - lo)).alias(name))
    out += [F.col(name) for name in (extra or {})]
    return res.select(*out)
