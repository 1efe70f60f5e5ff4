"""Disproportionality statistics as column expressions (FDA LRT method).

Reference: ``stage/OpenFdaEtl.scala:146-155`` — given the 2x2 contingency
table per (drug, event)

    A = reports with drug AND event         B = event without drug
    C = drug without event                  D = neither

the log-likelihood ratio is

    aterm  = A * (ln A - ln(A+B))
    cterm  = C * (ln C - ln(C+D))
    acterm = (A+C) * (ln(A+C) - ln(A+B+C+D))
    llr    = aterm + cterm - acterm

Pure JVM column math (whole-stage codegen).  Edge cases: C=0 makes
``ln(C)`` NULL in Spark SQL (and -inf*0=NaN in engines with IEEE ln), so
callers filter ``llr IS NOT NULL AND NOT isnan(llr)`` exactly like the
reference's P7 (``stage/OpenFdaEtl.scala:157``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def aterm(a: Column, b: Column) -> Column:
    return a * (F.log(a) - F.log(a + b))


def cterm(c: Column, d: Column) -> Column:
    return c * (F.log(c) - F.log(c + d))


def acterm(a: Column, b: Column, c: Column, d: Column) -> Column:
    return (a + c) * (F.log(a + c) - F.log(a + b + c + d))


def llr(a: Column, b: Column, c: Column, d: Column) -> Column:
    """Log-likelihood ratio of the 2x2 table (OpenFdaEtl.scala:152-155)."""
    return aterm(a, b) + cterm(c, d) - acterm(a, b, c, d)
