"""Slowly-changing-dimension (SCD Type 2) historization from a change log.

Beyond-reference surface: the dimension-history primitive of an
incremental pipeline — given an append-only event/change log, produce one
row per (key, attribute-run) with validity interval and current flag.
Together with ``operators.merge.merge_upsert`` this covers the two classic
warehouse maintenance patterns (Type 1 overwrite / Type 2 history).

Plan shape at scale: one shuffle on the key for the per-key ordered
windows (change detection via null-safe lag compare, run id via running
sum), then a per-run aggregate and one more window for the closing
timestamp — all whole-stage-codegen window/agg operators, no Python, no
driver actions.  Skewed keys behave like any window partition (a single
key's history must fit a partition — true for real dimension keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an append-only log into SCD2 validity intervals.

    Consecutive equal ``attr`` values (per ``key``, ordered by ``ts_col``
    then ``tiebreak``) merge into one run; each run becomes a row with
    ``valid_from`` (first ts of the run), ``valid_to`` (first ts of the
    next run, NULL for the open current row), a 1-based ``version``, and
    ``is_current``.  The change detector is null-safe (a NULL attr value
    is a legal tracked state, distinct from any non-NULL state).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # first row of a key always starts a run; after that, a run starts
    # wherever the (null-safe) attr value differs from the previous row
    changed = F.when(F.row_number().over(w) == 1, F.lit(True)).otherwise(
        ~F.col(attr).eqNullSafe(F.lag(attr).over(w))
    )
    runs = df.withColumn(
        "version",
        F.sum(changed.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_run = runs.groupBy(key, "version").agg(
        F.first(attr).alias(attr),  # attr is constant within a run
        F.min(ts_col).alias("valid_from"),
    )
    wv = Window.partitionBy(key).orderBy(F.col("version").asc())
    return per_run.select(
        F.col(key),
        F.col(attr),
        F.col("valid_from"),
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
