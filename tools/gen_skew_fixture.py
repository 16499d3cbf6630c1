"""Generate a SKEWED fixture dir for the second robustness-sweep axis.

gen_robust_fixture.py perturbs SIZE and vocabulary; this tool perturbs
SHAPE: hot keys and duplicate-heavy text — the distributions that break
group-size assumptions, tie handling, bucket caps, and top-k boundaries.
Derived from sf0.01 into /tmp/pmr_skew:

- documents: ~25% of docs get doc 0's text verbatim (one giant exact-dup
  and near-dup cluster — stresses the LSH bucket cap's hub-star path,
  survivor windows, and every GROUP BY text);
- events: ~30% of events reassigned to user 1 and 'click' (hot
  aggregation key + heavy_hitters band shifts + mode ties);
- lineitem: ~20% of lines moved to one orderkey (skewed join/agg key,
  AQE skew-split territory);
- customer/orders/supplier/part copied unchanged (FKs still resolve: the
  hot orderkey is an existing one).

Deterministic (doc_id/event_id/orderkey arithmetic, no RNG). Run the
whole differential against it: tools/driver_sim.py --sf-dir /tmp/pmr_skew.
Disagreements = assumptions about benign data shape.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.01"
OUT = "/tmp/pmr_skew"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "embeddings"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )

    # hot text: every 4th doc carries doc 0's text (keep its own metadata)
    con.sql(
        f"""
        COPY (
            SELECT d.doc_id,
                   CASE WHEN d.doc_id % 4 = 1 THEN h.text ELSE d.text END AS text,
                   d.lang, d.source,
                   CAST(LENGTH(CASE WHEN d.doc_id % 4 = 1 THEN h.text
                               ELSE d.text END) AS BIGINT) AS n_chars
            FROM read_parquet('{SRC}/documents.parquet') d
            CROSS JOIN (SELECT text FROM read_parquet('{SRC}/documents.parquet')
                        ORDER BY doc_id LIMIT 1) h
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # hot user + hot event type on ~30% of events
    con.sql(
        f"""
        COPY (
            SELECT event_id, ts,
                   CASE WHEN event_id % 10 < 3 THEN 1 ELSE user_id END AS user_id,
                   CASE WHEN event_id % 10 < 3 THEN 'click' ELSE event_type END
                       AS event_type,
                   value, props
            FROM read_parquet('{SRC}/events.parquet')
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
        """
    )

    # hot orderkey on ~20% of lineitem (first orderkey absorbs them)
    con.sql(
        f"""
        COPY (
            SELECT CASE WHEN l_orderkey % 5 = 2 THEN
                       (SELECT MIN(o_orderkey)
                        FROM read_parquet('{SRC}/orders.parquet'))
                   ELSE l_orderkey END AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
        """
    )


if __name__ == "__main__":
    main()
    for t in ("documents", "events", "lineitem"):
        print(t, duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0])
    print("dup-text docs:", duckdb.sql(
        f"SELECT MAX(c) FROM (SELECT COUNT(*) c FROM"
        f" read_parquet('{OUT}/documents.parquet') GROUP BY text)"
    ).fetchone()[0])
