"""Generate a TIME-WARPED fixture dir for the fifth robustness-sweep
axis: temporal shape.

The committed events span ~60 days with driver-chosen boundaries; every
streaming/window oracle that pins a watermark cutoff, window population,
or boundary alignment could silently depend on that layout (the
stream_chained_agg `max(ts) - 2h` inclusive-edge note in ADVICE r3 is
exactly this class). Derived from sf0.01 into /tmp/pmr_temporal, events
get a deterministic affine time warp:

    ts' = min_ts + (ts - min_ts) / 32 + 37 min 13 s

- the /32 compression packs the same event stream into ~1.9 days, so
  6-hour tumbling/sliding windows hold ~32× more events, session gaps
  merge, and watermark horizons (2 h / 40 days) cover a very different
  fraction of the stream;
- the +37m13s offset de-aligns every window boundary from round hours
  (an alignment assumption ASCII-style fixtures never test);
- event order, user structure, values, and props are unchanged, and the
  warp is monotonic, so watermark semantics stay well-defined.

All other tables copy unchanged. Deterministic, no RNG. Run the whole
differential: ``python tools/driver_sim.py --sf-dir /tmp/pmr_temporal``.
Disagreements = fixture-clock dependence in a query or its oracle.

Assumes the source events.parquet is TIMESTAMP(MICROS) (the current
generation; for a NANOS round, catalog.load still normalizes but this
generator's epoch_us arithmetic would need a TIMESTAMP cast first).

Measurement/validation only — never used by the committed gates.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.01"
OUT = "/tmp/pmr_temporal"

_COMPRESS = 32
_OFFSET_US = (37 * 60 + 13) * 1_000_000


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )

    con.sql(
        f"""
        COPY (
            WITH b AS (
                SELECT MIN(epoch_us(ts)) AS mn
                FROM read_parquet('{SRC}/events.parquet')
            )
            SELECT event_id,
                   make_timestamp(
                       mn + (epoch_us(ts) - mn) // {_COMPRESS} + {_OFFSET_US}
                   ) AS ts,
                   user_id, event_type, value, props
            FROM read_parquet('{SRC}/events.parquet'), b
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
        """
    )

    lo, hi = con.sql(
        f"SELECT MIN(ts), MAX(ts) FROM read_parquet('{OUT}/events.parquet')"
    ).fetchone()
    print(f"wrote {OUT}: events span {lo} .. {hi}")


if __name__ == "__main__":
    main()
