#!/usr/bin/env python
"""Round-closing evidence gate (VERDICT r9 #1): fail LOUDLY if any
committed evidence artifact lags the live query registry.

The manual refresh discipline shipped stale artifacts three rounds
running (r7: miscounted rotation comments; r8: five queries missing from
the local correctness files; r9: the late additions missing from
CORRECTNESS_LOCAL / PLANS and a stale COVERAGE totals block).  This tool
mechanizes the invariant the same way ``_apply_driver_order`` mechanized
the rotation bookkeeping: load ``queries()`` and exit NONZERO — no
documented-convention exception — unless, for the given round N:

1. ``CORRECTNESS_LOCAL_r{N}.json`` AND ``CORRECTNESS_LOCAL_r{N}_sf0001
   .json`` each contain a row for EVERY registered query, every row is
   green (oracle-checked queries: all three match flags true; rows-only
   queries: err == "no_oracle" and spark_rows > 0), and the embedded
   ``_cache_lifetime`` audit is clean (no queries missing handles, SQL
   cache empty at end);
2. ``PLANS.md`` has a table row for EVERY registered query;
3. the ``COVERAGE.md`` totals block matches the live counts
   (``update_coverage --check`` semantics, same code path).

Run as the LAST step before the closing commit:

    python tools/evidence_gate.py 10
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def check_correctness_file(
    path: Path, names: set[str], oracles: set[str], problems: list[str]
) -> None:
    if not path.exists():
        problems.append(f"{path.name}: MISSING")
        return
    doc = json.loads(path.read_text())
    cache = doc.pop("_cache_lifetime", None)
    if cache is None:
        problems.append(f"{path.name}: no _cache_lifetime audit block")
    else:
        if cache.get("queries_missing_handles"):
            problems.append(
                f"{path.name}: queries persist without handles: "
                f"{sorted(cache['queries_missing_handles'])}"
            )
        if not cache.get("sql_cache_empty_at_end"):
            problems.append(f"{path.name}: SQL cache not empty at end")
    missing = sorted(names - set(doc))
    if missing:
        problems.append(
            f"{path.name}: {len(missing)} registry queries have no row: "
            f"{missing}"
        )
    stale = sorted(set(doc) - names)
    if stale:
        problems.append(
            f"{path.name}: {len(stale)} rows for queries no longer "
            f"registered: {stale}"
        )
    for name in sorted(names & set(doc)):
        row = doc[name]
        if name in oracles:
            if not (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                problems.append(f"{path.name}: {name} row is not green: {row}")
        else:
            if row.get("err") != "no_oracle" or not row.get("spark_rows"):
                problems.append(
                    f"{path.name}: rows-only {name} not green: {row}"
                )


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    tag = f"r{rnd:02d}"

    from platform_etl_openfda_faers_spark.plans import benchmarks

    names = set(benchmarks.SPARK_QUERIES)
    oracles = set(benchmarks.ORACLE_SQL)
    problems: list[str] = []

    # 1. both local correctness artifacts cover the full registry, green
    check_correctness_file(
        REPO / f"CORRECTNESS_LOCAL_{tag}.json", names, oracles, problems
    )
    check_correctness_file(
        REPO / f"CORRECTNESS_LOCAL_{tag}_sf0001.json", names, oracles, problems
    )

    # 2. every query has a PLANS.md table row
    plans = (REPO / "PLANS.md").read_text()
    plan_rows = set(re.findall(r"^\| ([a-z0-9_]+) \|", plans, re.MULTILINE))
    no_plan = sorted(names - plan_rows)
    if no_plan:
        problems.append(
            f"PLANS.md: {len(no_plan)} registry queries have no plan row: "
            f"{no_plan}"
        )

    # 3. COVERAGE totals block matches live counts (shared code path)
    from tools.update_coverage import main as coverage_main

    if coverage_main(check_only=True) != 0:
        problems.append("COVERAGE.md: totals block is stale (see above)")

    if problems:
        print(f"\nEVIDENCE GATE FAILED ({len(problems)} problems):")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(
        f"evidence gate green for {tag}: {len(names)} queries covered by "
        f"both correctness artifacts, PLANS.md, and COVERAGE totals"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
