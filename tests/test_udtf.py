"""Python UDTF surface (Spark 4) — the table-function escape hatch.

The engine's standing rule is built-ins first (SURVEY.md §2.8: the
reference needs zero UDFs, and expressions stay in codegen); these tests
pin that the UDTF path WORKS for the cases where a future operator
genuinely needs one row-set per input row with dynamic logic — and that
the lateral-join plumbing, arguments, and error isolation behave.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, piece string")
class SplitWords:
    """Yield one row per word with its position — the minimal
    one-to-many shape (the built-in posexplode(split(...)) equivalent,
    used here only to differential-test the UDTF machinery itself)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, piece in enumerate(text.split()):
            yield i, piece


def test_udtf_lateral_join_matches_builtin_explode(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d"), (3, None), (4, "")],
        "id int, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_words", SplitWords)

    got = spark.sql(
        "SELECT id, chunk_idx, piece FROM udtf_docs, "
        "LATERAL split_words(text)"
    ).collect()
    want = (
        df.select(
            "id", F.posexplode(F.split(F.trim("text"), r"\s+"))
        )
        .where(F.col("col") != "")
        .selectExpr("id", "pos AS chunk_idx", "col AS piece")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_udtf_terminate_emits_summary_rows(spark):
    """terminate() runs once per partition-instance after all eval()
    calls — the aggregation-flush hook custom table functions use."""

    @udtf(returnType="kind string, n int")
    class CountingEmit:
        def __init__(self):
            self.seen = 0

        def eval(self, row):
            # TABLE(...) arguments arrive as Row objects
            self.seen += 1
            yield "row", row["id"]

        def terminate(self):
            yield "summary", self.seen

    spark.udtf.register("counting_emit", CountingEmit)
    rows = spark.sql(
        "SELECT * FROM counting_emit(TABLE(SELECT id FROM range(5)))"
    ).collect()
    kinds = [r.kind for r in rows]
    assert kinds.count("row") == 5
    # one summary per partition-instance; their counts total the rows
    assert sum(r.n for r in rows if r.kind == "summary") == 5
