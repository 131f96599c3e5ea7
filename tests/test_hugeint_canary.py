"""Permanent home of the HUGEINT divergence axis (VERDICT r8 #2).

``canary_sum_hugeint_uncast`` was a registry query through r8 whose
driver row was red BY DESIGN: its oracle leaves ``SUM(user_id)`` uncast,
so DuckDB returns HUGEINT (int128), and a pandas-based artifact fetch
renders that as float64 ("5.0") while Spark emits bigint ("5") — a
hash mismatch with identical values. The axis was proven twice (driver
red r3 + r8; green on the local fetchall replica both times), so the
query is retired from ``queries()`` and the assertion lives here
instead — no window slot is ever again spent on a designed-red row.

Three facts are pinned:

1. DuckDB really does type the uncast SUM as HUGEINT (the axis exists).
2. The pandas fetch path renders it as float (the divergence mechanism).
3. The Spark query still value-matches the fetchall replica exactly
   (the engine is right; only the transport rendering diverges).

If (1) or (2) ever stops holding — a DuckDB or pandas upgrade changing
int128 handling — this test fails loudly and determinism rule #9
("CAST every integer SUM to BIGINT") should be re-evaluated.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from wistia_etl_pipeline_spark.queries.q04_canaries_curation import (  # noqa: E402
    HUGEINT_CANARY_ORACLE,
    canary_sum_hugeint_uncast,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    yield c
    c.close()


def test_uncast_sum_is_hugeint(con):
    rel = con.sql(HUGEINT_CANARY_ORACLE)
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert types["s_uid"] == "HUGEINT", (
        "DuckDB no longer types an uncast integer SUM as HUGEINT "
        f"(got {types['s_uid']}) — the canary axis has moved; revisit "
        "determinism rule #9"
    )


def test_pandas_fetch_renders_hugeint_as_float(con):
    pdf = con.sql(HUGEINT_CANARY_ORACLE).df()
    assert str(pdf["s_uid"].dtype) in ("float64", "object"), (
        f"pandas fetch now yields {pdf['s_uid'].dtype} for HUGEINT — "
        "the driver-side rendering divergence may be gone"
    )
    vals = con.sql(HUGEINT_CANARY_ORACLE).fetchall()
    assert all(isinstance(r[1], int) for r in vals), (
        "fetchall no longer yields Python ints for HUGEINT"
    )


def test_spark_matches_fetchall_replica(spark, sf_dir, con):
    from check_correctness import _hash

    sdf = canary_sum_hugeint_uncast(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    orows = con.sql(HUGEINT_CANARY_ORACLE).fetchall()
    assert _hash(srows, sdf.columns) == _hash(
        orows, list(con.sql(HUGEINT_CANARY_ORACLE).columns)
    ), "Spark diverged from the fetchall oracle replica — a REAL bug, not the rendering axis"


def test_canary_is_deregistered():
    from wistia_etl_pipeline_spark import registry

    assert "canary_sum_hugeint_uncast" not in registry.queries()
    assert "canary_sum_hugeint_uncast" not in registry.oracle_sql()
