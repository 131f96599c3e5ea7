"""Scalar function surface — F1-F7 (SURVEY.md §2.6).

Everything here is a thin, documented composition of built-in
``pyspark.sql.functions`` — no Python UDFs, so every expression stays
inside whole-stage codegen (the reference likewise uses no UDFs,
SURVEY.md §2.8). Each function cites the reference behavior it
reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def iso_to_timestamp(col: Column | str) -> Column:
    """F1 — ISO-8601 string → UTC timestamp.

    Handles both ``…Z`` and ``…+00:00`` suffixes (the two forms in the
    reference's watermarks.json; parsed by ``iso_to_dt`` at
    bronze.py:79-81). Spark's ``to_timestamp`` accepts both natively
    under a UTC session timezone — the engine pins that via
    ``session.apply_runtime_confs``.
    """
    return F.to_timestamp(col)


def utc_date_str(col: Column | str) -> Column:
    """F2 — format a timestamp as ``YYYY-MM-DD`` (UTC partition value,
    bronze.py:120)."""
    return F.date_format(col, "yyyy-MM-dd")


def watermark_gt(col: Column | str, watermark: Column) -> Column:
    """F3 — the watermark comparison ``updated > last_seen``
    (bronze.py:173). Operates on TimestampType; the reference's
    lexicographic ISO-string compare (bronze.py:220) is equivalent only
    for UTC-normalized strings, so we normalize first (F1)."""
    col = F.col(col) if isinstance(col, str) else col
    return col > watermark


def max_timestamp(col: Column | str) -> Column:
    """F4 — running high-water mark: MAX over timestamps. The reference
    folds ``max(received_at)`` across pages as strings (bronze.py:220);
    on TimestampType the same fold is timezone-safe."""
    return F.max(col)


def extract_json_field(col: Column | str, path: str) -> Column:
    """F5 — JSON field extraction (the reference parses
    string-or-JSON secrets at bronze.py:44-46). ``path`` is a JSONPath
    like ``$.k``."""
    return F.get_json_object(col, path)


def strip(col: Column | str) -> Column:
    """F5 — whitespace strip (bronze.py:44)."""
    return F.trim(col)


def to_double(col: Column | str) -> Column:
    """F6 — string→double cast (silver.py:78)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("double")


def page_url(base: Column | str, page: Column | int, per_page: Column | int) -> Column:
    """F7 — paging URL construction (bronze.py:111-114), as a codegen
    expression for when URLs are built per-row (distributed fetch)."""
    page = F.lit(page) if isinstance(page, int) else page
    per_page = F.lit(per_page) if isinstance(per_page, int) else per_page
    return F.format_string("%s?page=%s&per_page=%s", base, page, per_page)


def coalesce_updated(*cols: Column | str, sentinel: str | None = None) -> Column:
    """P4 — null-coalescing field fallback (bronze.py:163-169):
    ``updated or updated_at or created or created_at or sentinel``."""
    resolved = [F.col(c) if isinstance(c, str) else c for c in cols]
    if sentinel is not None:
        resolved.append(F.lit(sentinel))
    return F.coalesce(*resolved)
