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


# Fixed stopword cycle for the PROSE construction (all in the gate's
# English stopword list) — every 4th position, so stop_permille lands
# ~200, prose-typical rather than saturated.
_STOPS = ["the", "and", "of", "to", "in", "a", "is", "that"]


def calibration_frame(docs):
    """Labeled calibration population (VERDICT r13 #8): from each corpus
    doc derive one PROSE variant (label 1 — a stopword interleaved every
    4th token + a period every 12th, the signals running text carries)
    and one BOILERPLATE variant (label 0 — the doc's first 8 tokens
    pipe-joined with a nav/footer suffix: punct-dense, stopword-poor,
    short), so ground truth is known BY CONSTRUCTION and
    precision/recall of ``logit >= t`` is measurable per threshold.
    Deterministic column expressions only — re-runs are bit-identical.

    The synthetic corpus's own text can't carry this study: its 30-word
    vocab has no stopwords and no punctuation, so on raw docs the gate
    can only see length (the r13 separation study's honest boundary).
    The constructed variants exercise all four frozen features."""
    stops = F.array(*[F.lit(s) for s in _STOPS])
    toks = F.split(F.trim(F.col("text")), r"\s+")
    prose = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                toks,
                lambda t, i: F.when(
                    i % 4 == 0,
                    F.array(
                        F.element_at(
                            stops, ((i % 24) / 3).cast("int") + 1
                        ).cast("string"),
                        F.when(i % 12 == 8, F.concat(t, F.lit("."))).otherwise(t),
                    ),
                ).otherwise(
                    F.array(
                        F.when(i % 12 == 8, F.concat(t, F.lit("."))).otherwise(t)
                    )
                ),
            )
        ),
    )
    boiler = F.concat(
        F.concat_ws(" | ", F.slice(toks, 1, 8)),
        F.lit(" | Home | Login; Register; Help, FAQ."),
    )
    return docs.select(
        "doc_id", prose.alias("text"), F.lit(1).alias("label")
    ).unionByName(
        docs.select(
            "doc_id", boiler.alias("text"), F.lit(0).alias("label")
        )
    )


def calibration(spark, sf_dir: str) -> dict:
    """Precision/recall of the gate per candidate threshold over the
    labeled population — the evidence that threshold 0 is a measured
    operating point, not an arbitrary default."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = (
        calibration_frame(docs)
        .select(
            "label", quality_logit_micro(F.col("text")).alias("logit")
        )
        .persist()
    )
    rows = []
    for t in (
        -3_000_000, -1_500_000, -600_000, -150_000,
        0, 150_000, 300_000, 600_000,
    ):
        agg = scored.select(
            F.sum(((F.col("logit") >= t) & (F.col("label") == 1)).cast("long")).alias("tp"),
            F.sum(((F.col("logit") >= t) & (F.col("label") == 0)).cast("long")).alias("fp"),
            F.sum(((F.col("logit") < t) & (F.col("label") == 1)).cast("long")).alias("fn"),
            F.count("*").alias("n"),
        ).collect()[0]
        tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
        prec = tp / (tp + fp) if tp + fp else None
        rec = tp / (tp + fn) if tp + fn else 0.0
        rows.append(
            {
                "threshold_micro": t,
                "precision": round(prec, 4) if prec is not None else None,
                "recall": round(rec, 4),
                "f1": round(2 * prec * rec / (prec + rec), 4)
                if prec and (prec + rec)
                else 0.0,
                "keep_rate": round((tp + fp) / agg["n"], 4),
            }
        )
    scored.unpersist()
    return {"positive_class": "prose", "by_threshold": rows}


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
    out = {
        "sf_dir": sf_dir,
        **keep_rates(spark, sf_dir),
        "calibration": calibration(spark, sf_dir),
    }
    print(json.dumps(out))
    if out_path:
        Path(out_path).write_text(json.dumps(out, indent=1))
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
