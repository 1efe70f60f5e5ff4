#!/usr/bin/env python
"""One-step round close: regenerate the COVERAGE totals block, run the
evidence gate, and make the closing commit ATOMICALLY (VERDICT r15 #2).

The gate exists precisely to stop stale evidence at close, but it only
works if it actually runs last: r15 shipped a tree where one test was
added AFTER the last totals regeneration and the round closed without
re-running the gate — the r7/r8/r9 failure mode recurring in miniature.
The countermeasure is mechanical sequencing, not discipline:

    python tools/close_round.py <round> [-m "commit message"] [--no-commit]

does, in order, refusing to proceed past any failure:

1. ``update_coverage.py``         — rewrite the totals block from live
                                     counts (registry + pytest collect);
2. ``git add COVERAGE.md``        — so the gate checks what will ship;
3. ``evidence_gate.py <round>``   — the full artifact-vs-registry gate;
4. ``git commit``                 — ONLY if the gate exited 0, with
                                     everything staged plus COVERAGE.md
                                     (skipped under ``--no-commit``, for
                                     a dry run or when the caller owns
                                     the commit).

If anything changes after this commit, run it again — the point is that
the LAST commit of a round is always one this script made (or one whose
tree the gate was re-run on).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(argv: list[str], what: str) -> None:
    proc = subprocess.run(argv, cwd=REPO)
    if proc.returncode != 0:
        print(
            f"close_round: {what} failed (exit {proc.returncode}) — "
            "round NOT closed; fix and re-run",
            file=sys.stderr,
        )
        sys.exit(proc.returncode or 1)


def main() -> int:
    args = sys.argv[1:]
    if not args or not args[0].isdigit():
        print(__doc__, file=sys.stderr)
        return 2
    rnd = args[0]
    msg = None
    if "-m" in args:
        msg = args[args.index("-m") + 1]
    no_commit = "--no-commit" in args

    run([sys.executable, "tools/update_coverage.py"], "COVERAGE refresh")
    run(["git", "add", "COVERAGE.md"], "staging COVERAGE.md")
    run([sys.executable, "tools/evidence_gate.py", rnd], "evidence gate")
    if no_commit:
        print("close_round: gate green; --no-commit, stopping here")
        return 0
    run(["git", "add", "-u"], "staging tracked changes")
    # anything staged? (an idempotent re-close must not make an empty
    # commit)
    diff = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=REPO
    )
    if diff.returncode == 0:
        print("close_round: gate green; nothing to commit")
        return 0
    run(
        [
            "git",
            "commit",
            "-m",
            msg or f"r{rnd} close: coverage totals refreshed, gate green",
        ],
        "closing commit",
    )
    print(f"close_round: round {rnd} closed with the gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
