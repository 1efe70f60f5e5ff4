"""Range (interval) join — match right rows whose timestamp falls in a
window around each left row's timestamp (beyond-reference surface; the
reference has only equi-joins, SURVEY §2.4).

Spark-first implementation: the **time-bin bucketing trick**.  A naive
``l.ts - tol <= r.ts <= l.ts`` condition on top of an equi-key gives Spark a
join with a non-equi conjunct; the equi part still hash-partitions, but
every (key) group degenerates to a per-group nested loop — O(n*m) per key,
which dies on hot keys at 100 TB.  Instead:

1. pick the bin width = the window span, in integer microseconds;
2. each RIGHT row maps to exactly one ``(key, bin)``;
3. each LEFT row's window ``[ts+lower, ts+upper]`` overlaps at most two
   adjacent bins -> explode left to those bins (constant factor <= 2);
4. equi-join on ``(key, bin)`` — a plain hash join Catalyst/AQE can
   partition, broadcast, or skew-split like any other;
5. re-check the exact range predicate on the survivors.

Each (left, right) match is produced exactly once because the right row
lives in a single bin.  All arithmetic is integer microseconds
(``unix_micros``), so bin assignment is exact — no float-boundary drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.readers import normalize_timestamps


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join rows with ``right_ts in [left_ts + lower_s, left_ts + upper_s]``
    (bounds in seconds, inclusive) and equal ``key``.

    Returns all left columns plus the right columns (right's key column is
    dropped; its ts column must be distinctly named).

    ``how="left_outer"`` additionally keeps every unmatched left row with
    NULL right columns.  The outer pass cannot ride on the exploded
    equi-join directly (a left row is exploded into <=2 bin copies and may
    match in only one of them, so a per-copy outer join would emit false
    unmatched rows); instead unmatched lefts are recovered with a left-anti
    join of the original left against the matched ids — one extra shuffle
    on ``left_id``, no nested-loop anywhere.

    ``how="left_semi"`` returns each left row at most once iff it has a
    match in the window (left columns only) — same dedup-by-``left_id``
    mechanics.

    ``left_id`` — for the outer/semi variants, a column that UNIQUELY
    identifies left rows.  Uniqueness is load-bearing, not advisory: with
    duplicate ids a matching row suppresses the unmatched emission of its
    twin (silently wrong results).  When omitted, a synthetic unique id is
    derived via ``monotonically_increasing_id`` — always correct w.r.t.
    duplicates, and stable here because the id is assigned once on the
    un-exploded left and every later branch (match, anti/semi) reuses that
    same projection node.  Pass an explicit id when you have one: the
    synthetic route relies on deterministic scan order, which holds for
    file sources but not for e.g. a ``LIMIT`` without ordering.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    if how not in ("inner", "left_outer", "left_semi"):
        raise ValueError(
            f"how must be inner, left_outer, or left_semi, got {how!r}"
        )
    synthetic_id = how != "inner" and left_id is None
    if synthetic_id:
        left_id = "_lrj_id"
        if left_id in left.columns:
            raise ValueError(f"left already has a column named {left_id}")
        left = left.withColumn(left_id, F.monotonically_increasing_id())
    width = int(round((upper_s - lower_s) * 1_000_000))
    if width < 1:
        # sub-microsecond window: bin width rounds to 0 and the DIV-based
        # bin assignment would yield NULL bins (silently empty join)
        raise ValueError(
            "window span must be at least 1 microsecond "
            f"(got {upper_s - lower_s} s)"
        )
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))

    # defensively relabel TIMESTAMP_NTZ as session-zone TIMESTAMP so the
    # integer-micros arithmetic below resolves (one policy, one place —
    # sources.readers.normalize_timestamps)
    left = normalize_timestamps(left)
    right = normalize_timestamps(right)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # left window spans exactly `width` us -> overlaps at most 2 bins
    lo_bin = F.expr(f"(unix_micros({left_ts}) + {lo_us}) DIV {width}")
    hi_bin = F.expr(f"(unix_micros({left_ts}) + {hi_us}) DIV {width}")
    l = left.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    r = right.withColumnRenamed(key, "_rkey").withColumn(
        "_bin", F.expr(f"unix_micros({right_ts}) DIV {width}")
    )

    joined = l.join(
        r, (F.col(key) == F.col("_rkey")) & (l["_bin"] == r["_bin"])
    )
    matched = joined.where(
        (r_us >= l_us + F.lit(lo_us)) & (r_us <= l_us + F.lit(hi_us))
    ).drop("_bin", "_rkey")
    if how == "inner":
        return matched
    if how == "left_semi":
        out = left.join(
            matched.select(left_id), on=left_id, how="left_semi"
        )
        return out.drop("_lrj_id") if synthetic_id else out
    right_cols = [c for c in right.columns if c != key]
    unmatched = left.join(
        matched.select(left_id), on=left_id, how="left_anti"
    ).select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_cols
        ],
    )
    out = matched.select(*left.columns, *right_cols).unionByName(unmatched)
    return out.drop("_lrj_id") if synthetic_id else out
