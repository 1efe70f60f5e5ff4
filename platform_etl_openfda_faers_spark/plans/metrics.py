"""Runtime stage-metric deltas (shuffle bytes, spill, input volume).

Wraps the JVM ``AppStatusStore`` — the same numbers the Spark UI's stage
page shows — so callers can assert DATA MOVEMENT, not just wall time or
static plan shape.  A plan audit proves the plan has one Exchange; only a
runtime byte count proves that Exchange moved 2 MB and not 20 GB.  Used
by ``bench.py`` (per-query ``shuffle_bytes`` in the bench JSON) and the
runtime audits in ``tests/test_plan_audits.py``.

Driver-local and read-only: one py4j call per snapshot, no listener
registration, works with the UI disabled.
"""

from __future__ import annotations


class StageMetrics:
    """Delta-based collector: ``snapshot()`` before a job, ``delta()``
    after — sums metrics over the stages that ran in between."""

    def __init__(self, spark) -> None:
        sc = spark.sparkContext
        self._store = sc._jsc.sc().statusStore()
        self._jvm = sc._jvm
        self._quantiles = sc._gateway.new_array(self._jvm.double, 0)
        self._seen: set[int] = set()

    def _stages(self):
        empty = self._jvm.java.util.ArrayList()
        it = self._store.stageList(
            empty, False, False, self._quantiles, empty
        ).iterator()
        while it.hasNext():
            yield it.next()

    def snapshot(self) -> None:
        self._seen = {st.stageId() for st in self._stages()}

    def delta(self) -> dict[str, int]:
        out = {"shuffle_write": 0, "shuffle_read": 0, "spill_disk": 0,
               "spill_mem": 0, "input_bytes": 0}
        for st in self._stages():
            if st.stageId() in self._seen:
                continue
            out["shuffle_write"] += st.shuffleWriteBytes()
            out["shuffle_read"] += st.shuffleReadBytes()
            out["spill_disk"] += st.diskBytesSpilled()
            out["spill_mem"] += st.memoryBytesSpilled()
            out["input_bytes"] += st.inputBytes()
        return out
