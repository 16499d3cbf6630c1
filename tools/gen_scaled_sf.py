"""Generate sf0.3 / sf1.0 MEASUREMENT-ONLY inputs for the pair-generating
tier's scaling check (SCALING.md's second table).

The driver ships parquet only up to sf0.1; superlinear terms in the
pair-generating queries (semdedup, dedup_near, tfidf_cosine_pairs,
remove_dup_spans, triangle_count) can hide under fixed costs at that size —
round 3's semdedup flaw was exactly such a case. These dirs extend the
measured range another decade. They are derived from the committed sf0.1
fixtures, written under /tmp (never into /root/testdata), and used ONLY by
tools/scaling_report.py — correctness gates still run exclusively against
the driver-generated fixtures.

Scaling semantics mirror TPC-H SF growth (entity counts grow, per-entity
density stays constant), so a linear plan measures linear instead of being
punished by artificially densified data:
- documents: R replicas; replica r>0 gets every token suffixed `_r{r}`
  (vocabulary grows with the corpus — Heaps-law-style — so shingle/DF
  distributions per replica match sf0.1 and near-dup/posting structure
  scales linearly, instead of every replica being a near-dup of replica 0,
  which would square the TRUE pair count by construction).
- embeddings: fresh iid vectors per replica drawn from the sf0.1
  coordinate moments (same norm distribution, same label set).
- orders/lineitem: R replicas with orderkeys AND partkeys offset per
  replica — more orders over proportionally more parts, constant
  co-occurrence degree (TPC-H's own SF semantics).

Deterministic (fixed seed, stable replica transforms). Run:
    python tools/gen_scaled_sf.py        # writes /tmp/pmr_scale/sf{0.3,1.0}
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/pmr_scale"
REPLICAS = {"0.3": 3, "1.0": 10}
SEED = 42


def _gen_documents(con: duckdb.DuckDBPyConnection, out_dir: str, r: int) -> None:
    parts = []
    for i in range(r):
        if i == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
        else:
            # \s+ split + empty-token filter matches the engine-wide
            # tokenizer contract — a bare string_split(text, ' ') would
            # mint spurious '_rN' tokens from consecutive-whitespace runs
            # and skew the replica's token/shingle distribution
            parts.append(
                f"""
                SELECT doc_id + {i} * (1 + (SELECT MAX(doc_id) FROM
                           read_parquet('{SRC}/documents.parquet'))) AS doc_id,
                       array_to_string(
                           list_transform(
                               list_filter(string_split_regex(text, '\\s+'),
                                           t -> t <> ''),
                               t -> t || '_r{i}'), ' ') AS text,
                       lang, source,
                       CAST(LENGTH(array_to_string(
                           list_transform(
                               list_filter(string_split_regex(text, '\\s+'),
                                           t -> t <> ''),
                               t -> t || '_r{i}'), ' ')) AS BIGINT)
                           AS n_chars
                FROM read_parquet('{SRC}/documents.parquet')
                """
            )
    con.sql(
        "COPY (" + " UNION ALL ".join(parts) + f") TO '{out_dir}/documents.parquet'"
        " (FORMAT PARQUET)"
    )


def _gen_embeddings(out_dir: str, r: int) -> None:
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(base.column("label").to_pylist())
    vec_ids = np.array(base.column("vec_id").to_pylist(), dtype=np.int64)
    mu, sd = emb.mean(), emb.std()
    n, d = emb.shape
    rng = np.random.default_rng(SEED)
    out_ids, out_emb, out_lab = [vec_ids], [emb.astype(np.float32)], [labels]
    off = vec_ids.max() + 1
    for i in range(1, r):
        out_ids.append(vec_ids + i * off)
        out_emb.append(rng.normal(mu, sd, size=(n, d)).astype(np.float32))
        out_lab.append(labels)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in np.concatenate(out_emb)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                np.concatenate(out_lab).tolist(),
                type=base.schema.field("label").type,
            ),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def _gen_orders_lineitem(con: duckdb.DuckDBPyConnection, out_dir: str, r: int) -> None:
    okey_off = (
        f"(1 + (SELECT MAX(o_orderkey) FROM read_parquet('{SRC}/orders.parquet')))"
    )
    pkey_off = (
        f"(1 + (SELECT MAX(l_partkey) FROM read_parquet('{SRC}/lineitem.parquet')))"
    )
    o_parts = [
        f"SELECT o_orderkey + {i} * {okey_off} AS o_orderkey, o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM read_parquet('{SRC}/orders.parquet')"
        for i in range(r)
    ]
    l_parts = [
        f"SELECT l_orderkey + {i} * {okey_off} AS l_orderkey,"
        f" l_partkey + {i} * {pkey_off} AS l_partkey,"
        f" l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        f" l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM read_parquet('{SRC}/lineitem.parquet')"
        for i in range(r)
    ]
    con.sql(
        "COPY (" + " UNION ALL ".join(o_parts) + f") TO '{out_dir}/orders.parquet'"
        " (FORMAT PARQUET)"
    )
    con.sql(
        "COPY (" + " UNION ALL ".join(l_parts) + f") TO '{out_dir}/lineitem.parquet'"
        " (FORMAT PARQUET)"
    )


def _gen_customer_events(out_dir: str, r: int) -> None:
    """customer and events for the exact-quantile tier (round 8): entity
    keys (c_custkey / event_id / user_id) offset per replica, VALUE
    columns (c_acctbal, ts, value) kept verbatim — more entities over
    the SAME bounded value domain, which is exactly the collapse
    assumption weighted_quantiles' scale claim rests on (and TPC-H's own
    SF semantics: acctbal's domain does not grow with SF). pyarrow
    round-trip preserves the exact schema — notably events' timestamp
    unit, which varies between driver generations (catalog sniffs it)."""
    for t, keys in (("customer", ["c_custkey"]), ("events", ["event_id", "user_id"])):
        base = pq.read_table(f"{SRC}/{t}.parquet")
        chunks = [base]
        offs = {k: pa.compute.max(base.column(k)).as_py() + 1 for k in keys}
        for i in range(1, r):
            cols = {}
            for name in base.column_names:
                col = base.column(name)
                if name in keys:
                    col = pa.compute.add(col, i * offs[name])
                cols[name] = col
            chunks.append(pa.table(cols))
        pq.write_table(
            pa.concat_tables(chunks).combine_chunks(), f"{out_dir}/{t}.parquet"
        )


def ensure_scaled_dirs() -> dict[float, str]:
    """Generate (idempotently) and return {sf: dir} for the scaled tiers."""
    con = duckdb.connect()
    out = {}
    for sf, r in REPLICAS.items():
        out_dir = os.path.join(OUT_ROOT, f"sf{sf}")
        out[float(sf)] = out_dir
        have = {
            t: os.path.exists(os.path.join(out_dir, f"{t}.parquet"))
            for t in ("documents", "embeddings", "orders", "lineitem",
                      "customer", "events")
        }
        if all(have.values()):
            continue
        os.makedirs(out_dir, exist_ok=True)
        if not (have["documents"] and have["embeddings"] and have["orders"]
                and have["lineitem"]):
            _gen_documents(con, out_dir, r)
            _gen_embeddings(out_dir, r)
            _gen_orders_lineitem(con, out_dir, r)
        if not (have["customer"] and have["events"]):
            _gen_customer_events(out_dir, r)
    return out


if __name__ == "__main__":
    dirs = ensure_scaled_dirs()
    for sf, d in sorted(dirs.items()):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{d}/documents.parquet')"
        ).fetchone()[0]
        print(f"sf{sf}: {d} documents={n}")
