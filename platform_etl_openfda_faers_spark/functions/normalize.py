"""Term-normalization column expressions (reference F1-F8, SURVEY §2.8).

FAERS encodes apostrophes as ``^`` — the reference maps them back with
``translate(x, '^', "'")`` (``stage/OpenFdaEtl.scala:78``,
``utils/Loaders.scala:60``).  Normalization parity matters: it drives the
hit-rate of the drug-name equi-join (J2) and the blacklist anti-join (J1).

All helpers return Column expressions (JVM-side, whole-stage-codegen
friendly) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_term(c: Column) -> Column:
    """lower + trim + '^'->''' — the canonical reaction/blacklist normalizer.

    Reference: ``stage/OpenFdaEtl.scala:78``, ``utils/Loaders.scala:60``.
    """
    return F.translate(F.trim(F.lower(c)), "^", "'")


def default_empty(c: Column) -> Column:
    """``ifnull(c, '')`` — reference F4, ``stage/OpenFdaEtl.scala:79-82``."""
    return F.coalesce(c, F.lit(""))


def default_empty_array(c: Column) -> Column:
    """``ifnull(c, array())`` for missing synonym arrays (OpenFdaEtl.scala:80-82)."""
    return F.coalesce(c, F.array().cast("array<string>"))


def merged_name_array(*cols: Column) -> Column:
    """Merge several name sources into one deduped array (F6-F8).

    Reference: ``stage/OpenFdaEtl.scala:93-97`` — ``array_distinct(concat(
    array(medicinalproduct), generic, brand, substance))``.
    """
    wrapped = [c for c in cols]
    return F.array_distinct(F.concat(*wrapped))
