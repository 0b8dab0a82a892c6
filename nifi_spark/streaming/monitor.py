"""Stream activity monitoring + named counters.

- :class:`ActivityMonitor` ≙ MonitorActivity (reference
  .../standard/MonitorActivity.java): NiFi emits an "inactive" indicator
  FlowFile when no data is seen for a threshold and a "restored" one when
  flow resumes. Spark-side this is a StreamingQueryListener tracking the
  last progress event with rows > 0; callers poll :meth:`status` or
  register callbacks.
- :func:`with_counters` ≙ UpdateCounter (.../standard/UpdateCounter.java):
  NiFi increments named counters visible in the UI; Spark's equivalent is
  ``df.observe`` — named aggregate metrics evaluated inline with the query
  (no extra pass, no driver round-trip) and surfaced on each progress
  event / ``Observation`` result.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # StreamingQueryListener import path is stable in pyspark>=3.4
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[misc,assignment]


class ActivityMonitor(StreamingQueryListener):
    """Tracks per-query last-activity time; flags inactivity past a threshold.

    Register with ``spark.streams.addListener(monitor)``. ``status(qid)``
    returns "active", "inactive" (no non-empty batch for threshold_s), or
    "unknown" (never seen).
    """

    def __init__(
        self,
        threshold_s: float = 60.0,
        on_inactive: Callable[[str], None] | None = None,
        on_restored: Callable[[str], None] | None = None,
    ):
        self.threshold_s = threshold_s
        self.on_inactive = on_inactive
        self.on_restored = on_restored
        self._last_activity: dict[str, float] = {}
        self._flagged: set[str] = set()

    # -- StreamingQueryListener hooks ------------------------------------
    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        self._last_activity[str(event.id)] = time.monotonic()

    def onQueryProgress(self, event):  # noqa: N802
        qid = str(event.progress.id)
        if event.progress.numInputRows > 0:
            self._last_activity[qid] = time.monotonic()
            if qid in self._flagged:
                self._flagged.discard(qid)
                if self.on_restored:
                    self.on_restored(qid)
        else:
            self._check(qid)

    def onQueryTerminated(self, event):  # noqa: N802
        self._last_activity.pop(str(event.id), None)
        self._flagged.discard(str(event.id))

    def onQueryIdle(self, event):  # noqa: N802
        self._check(str(event.id))

    # -- polling ----------------------------------------------------------
    def _check(self, qid: str) -> None:
        last = self._last_activity.get(qid)
        if last is not None and time.monotonic() - last > self.threshold_s:
            if qid not in self._flagged:
                self._flagged.add(qid)
                if self.on_inactive:
                    self.on_inactive(qid)

    def status(self, qid: str) -> str:
        last = self._last_activity.get(str(qid))
        if last is None:
            return "unknown"
        return "inactive" if time.monotonic() - last > self.threshold_s else "active"


def with_counters(df: DataFrame, name: str, **counters: Column) -> DataFrame:
    """Attach named observable counters to a DataFrame (≙ UpdateCounter).

    Each kwarg is an aggregate expression, e.g.::

        with_counters(events, "cdc",
                      n_deletes=F.count(F.when(F.col("op") == "D", 1)),
                      max_seq=F.max("seq"))

    Metrics appear in streaming progress events under ``observedMetrics``
    and in batch mode via ``Observation``. Zero extra passes over the data.
    """
    return df.observe(name, *[c.alias(n) for n, c in counters.items()])
