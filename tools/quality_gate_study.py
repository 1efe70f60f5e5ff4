#!/usr/bin/env python
"""Separation study for the frozen quality gate (VERDICT r12 #6).

``text_quality_score``'s oracle hash proves the gate computes exactly
what its weights declare; this tool carries the OTHER correctness axis
— that the gate separates anything — the same discipline as the ANN
recall study (tools/ann_recall.py / QUALITY.md).  It measures keep-rate
by content class on the synthetic corpus:

- length class (short < 30 tokens / mid / long >= 60) — the corpus's
  dominant quality signal (tok_cap saturates at 256, so short docs eat
  the -300k bias without the +6k/token credit);
- exact-duplicate "boilerplate" class (docs whose full text appears
  more than once — the synthetic stand-in for nav/footer boilerplate).

Floors/ceilings are pinned in CI by ``tests/test_quality_gate.py``.

Usage: python tools/quality_gate_study.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from platform_etl_openfda_faers_spark.functions.text import (  # noqa: E402
    quality_logit_micro,
    token_count,
)
from platform_etl_openfda_faers_spark.session import get_spark  # noqa: E402
from platform_etl_openfda_faers_spark.sources.readers import (  # noqa: E402
    load_table,
)


def keep_rates(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        (quality_logit_micro(F.col("text")) >= 0).cast("int").alias("keep"),
        F.count("*").over(Window.partitionBy(F.md5("text"))).alias(
            "n_copies"
        ),
    )
    cls = (
        F.when(F.col("n_tokens") < 30, "short")
        .when(F.col("n_tokens") >= 60, "long")
        .otherwise("mid")
    )
    by_len = {
        r["lencls"]: {"n": r["n"], "keep_rate": round(r["rate"], 4)}
        for r in scored.groupBy(cls.alias("lencls"))
        .agg(F.count("*").alias("n"), F.avg("keep").alias("rate"))
        .collect()
    }
    by_dup = {
        ("boilerplate" if r["dup"] else "body"): {
            "n": r["n"], "keep_rate": round(r["rate"], 4)
        }
        for r in scored.groupBy(
            (F.col("n_copies") > 1).alias("dup")
        )
        .agg(F.count("*").alias("n"), F.avg("keep").alias("rate"))
        .collect()
    }
    return {"by_length": by_len, "by_duplication": by_dup}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(
        "quality-gate-study",
        master="local[8]",
        conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": sf_dir, **keep_rates(spark, sf_dir)}
    print(json.dumps(out))
    if out_path:
        Path(out_path).write_text(json.dumps(out, indent=1))
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
