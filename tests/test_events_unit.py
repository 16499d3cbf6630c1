"""Events timestamp-unit robustness: the driver's data generator has
shipped events.ts as parquet TIMESTAMP(NANOS) in one round and
TIMESTAMP(MICROS) in another (TESTDATA regime, round 1 vs round 2+), so
every time-predicate in the engine depends on catalog's footer sniff
(`_events_ts_is_nanos`) and the nanosAsLong + floor-div normalization
behind `load` / `events_stream_source`. This suite derives BOTH a
micros-unit and a nanos-unit events.parquet from the committed fixture —
whatever unit that fixture currently ships in — and asserts
unit-invariance between the two end to end (batch, window, and streaming
paths). Deriving both sides keeps the suite meaningful across the
documented per-round unit flips: it never assumes the committed
fixture's unit, so a regeneration in either unit changes nothing here.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pythonmapreduce_spark import catalog
from pythonmapreduce_spark.plans import registry

registry.load_all()

# Time-sensitive representatives: tumbling event windows (window() over
# ts), session gaps (ts deltas), a sliding distinct-user window, and the
# watermarked streaming path.
_UNIT_SENSITIVE = [
    "window_tumbling",
    "window_session",
    "sliding_distinct_users",
    "stream_event_window",
]


def _events_in_unit(src: str, out: str, unit: str) -> None:
    tbl = pq.read_table(src)
    ts = tbl.column("ts").cast(pa.timestamp(unit))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    # version>=2.6 is what permits a true NANOS logical type — older
    # writer versions silently coerce back to µs, which would make the
    # nanos side of this suite test nothing.
    pq.write_table(tbl, out, version="2.6")


def _clone_sf(tmp_path_factory, sf_smoke: str, unit: str) -> str:
    d = tmp_path_factory.mktemp(f"{unit}_sf")
    for t in catalog.TABLES:
        src = catalog.table_path(sf_smoke, t)
        if t == "events":
            _events_in_unit(src, os.path.join(d, "events.parquet"), unit)
        else:
            shutil.copyfile(src, os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def micros_dir(tmp_path_factory, sf_smoke) -> str:
    return _clone_sf(tmp_path_factory, sf_smoke, "us")


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory, sf_smoke) -> str:
    # NOTE: if the committed fixture is µs (round 2+ regime), the ns cast
    # is exact; if it is ns, the µs side above floor-truncates exactly as
    # load() would — either way the two derived dirs hold the same µs
    # instants, which is the invariance contract.
    return _clone_sf(tmp_path_factory, sf_smoke, "ns")


def test_derived_fixtures_have_distinct_units(micros_dir, nanos_dir) -> None:
    assert catalog._events_ts_is_nanos(catalog.table_path(nanos_dir, "events"))
    assert not catalog._events_ts_is_nanos(catalog.table_path(micros_dir, "events"))


def test_load_normalizes_nanos_to_micros(spark, micros_dir, nanos_dir) -> None:
    # the logical schema every query sees must be identical, and the µs
    # truncation must match what DuckDB's TIMESTAMP_NS → TIMESTAMP cast
    # (and the micros generator) produce: floor division, not rounding
    a = catalog.load(spark, micros_dir, "events")
    b = catalog.load(spark, nanos_dir, "events")
    assert a.schema == b.schema
    rows_a = Counter(str(tuple(r)) for r in a.select("event_id", "ts").collect())
    rows_b = Counter(str(tuple(r)) for r in b.select("event_id", "ts").collect())
    assert rows_a == rows_b


@pytest.mark.parametrize("name", _UNIT_SENSITIVE)
def test_unit_invariance(spark, micros_dir, nanos_dir, name) -> None:
    # multiset compare over stringified rows: None-vs-value cells must not
    # crash the comparison if a future fixture generation introduces NULLs
    fn = registry.QUERIES[name]
    want = Counter(str(tuple(r)) for r in fn(spark, micros_dir).collect())
    got = Counter(str(tuple(r)) for r in fn(spark, nanos_dir).collect())
    assert got == want
