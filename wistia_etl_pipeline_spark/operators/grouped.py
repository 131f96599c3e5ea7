"""Grouped-map Pandas operators — the ``groupBy().applyInPandas``
surface (the third Python-worker shape next to ``mapInPandas`` and
``applyInPandasWithState``).

Use when per-group logic genuinely needs the WHOLE group in one pandas
frame (order statistics, model fits, per-entity signal processing) and
no built-in aggregate expresses it. The contract scale-wise: one group
must fit one executor's memory — grouped-map is for bounded groups
(media ids, devices, users), never for unbounded keys; for algebraic
aggregates always prefer built-ins (partial-mergeable, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_robust_outliers(
    df: DataFrame,
    *,
    key: str,
    value: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier profile via median/MAD, one pandas
    kernel per group.

    Median and MAD are the canonical applyInPandas case: exact order
    statistics are not partial-mergeable (no algebraic decomposition),
    so a JVM aggregate can't compute them in one pass — but per group
    they're one ``np.median`` call. Output per key: ``n``,
    ``n_outliers`` (|x − median| > k·MAD), and the raw ``med_value`` /
    ``mad_value`` doubles (unrounded — per-row/order-statistic doubles
    are bit-deterministic across engines, determinism rule #2).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{key} string, n long, n_outliers long, med_value double, mad_value double"
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value].to_numpy(dtype=np.float64)
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        n_out = int((np.abs(x - med) > k * mad).sum())
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n": [len(x)],
                "n_outliers": [n_out],
                "med_value": [med],
                "mad_value": [mad],
            }
        )

    return df.select(key, value).groupBy(key).applyInPandas(profile, out_schema)


def cogrouped_asof_merge(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: tuple[str, ...],
) -> DataFrame:
    """Per-key as-of merge via ``cogroup().applyInPandas`` — the fourth
    Python-worker shape (two co-partitioned groups per kernel call).

    Each kernel receives BOTH sides of one key already co-shuffled and
    runs ``pd.merge_asof`` (backward: latest right row with
    ``right_time ≤ left_time``). This is the escape hatch when per-key
    reconciliation logic outgrows what a join can express (here it's
    deliberately merge_asof, so the DataFrame-composition as-of join in
    ``operators/asof.py`` and DuckDB's native ASOF JOIN can both verify
    it). Cost model: ONE co-shuffle of both sides on the key — same
    exchange bill as the composition form; prefer the composition when
    it fits (JVM-side, no Python workers)."""
    import pandas as pd

    key_type = dict(left.dtypes)[key]
    out_fields = ", ".join(f"{c} double" for c in value_cols)
    out_schema = f"{key} {key_type}, __lt timestamp, {out_fields}"

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_time)
        rpdf = rpdf.sort_values(right_time)
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_time, right_on=right_time, direction="backward"
        )
        out = pd.DataFrame({key: merged[f"{key}_x"], "__lt": merged[left_time]})
        for c in value_cols:
            out[c] = merged[c]
        return out

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
    )
