"""Streaming worker management — the reference's orchestration plane.

The reference runs a Flask webapp whose endpoints start/stop/poll two
"workers": the Kafka replay producer and the Dataproc-submitted streaming
job (webapp/buses-dashboard/main.py:74-192, pyspark_service.py:88-233,
kafka_service.py:71-104), with a hand-rolled state machine over Dataproc
Batch states (pyspark_service.py:307-344) polled by the dashboard every 3 s.

On a self-contained Spark engine that whole plane collapses onto
``StreamingQuery`` handles: ``query.status`` / ``query.lastProgress`` /
``query.exception()`` ARE the state machine. This module is the thin
equivalent — a registry of named workers with the same observable
lifecycle the webapp exposes (start / stop / status / healthy), so a
dashboard can poll ``manager.status()`` exactly as index.html polls
/spark_status.

Scale note: this is driver-side control plane only — no data moves through
it. Status snapshots read Spark-maintained metrics (no jobs triggered);
stopping is cooperative (query.stop() finishes the in-flight micro-batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamingWorkerManager:
    """Named registry of StreamingQuery workers (start/stop/status)."""

    _workers: dict[str, StreamingQuery] = field(default_factory=dict)

    def start(self, name: str, starter: Callable[[], StreamingQuery]) -> StreamingQuery:
        """Start a worker under ``name``. Starting an already-active name
        is a no-op returning the live query (mirrors the webapp's
        idempotent /start_spark endpoint, main.py:74-110)."""
        q = self._workers.get(name)
        if q is not None and q.isActive:
            return q
        q = starter()
        self._workers[name] = q
        return q

    def stop(self, name: str) -> bool:
        """Stop a worker; True if it was active. Unknown names are False
        (mirrors /stop_spark tolerating a dead batch)."""
        q = self._workers.get(name)
        if q is None or not q.isActive:
            return False
        q.stop()
        return True

    def stop_all(self) -> None:
        for name in list(self._workers):
            self.stop(name)

    def healthy(self, name: str) -> bool:
        """Active and exception-free — the reference's RUNNING state."""
        q = self._workers.get(name)
        return q is not None and q.isActive and q.exception() is None

    def status(self) -> dict[str, dict[str, Any]]:
        """Poll-friendly snapshot, one entry per worker — the engine-side
        equivalent of the /spark_status payload (main.py:150-192):
        state (RUNNING/STOPPED/FAILED), Spark's own status dict, and the
        last progress (rows/sec, batch duration, state-store metrics)."""
        out: dict[str, dict[str, Any]] = {}
        for name, q in self._workers.items():
            exc = q.exception()
            state = (
                "FAILED" if exc is not None
                else "RUNNING" if q.isActive
                else "STOPPED"
            )
            out[name] = {
                "state": state,
                "status": q.status,
                "last_progress": q.lastProgress,
                "error": str(exc) if exc is not None else None,
            }
        return out

    def await_idle(self, name: str) -> None:
        """Block until the worker has processed all available input —
        the offline-test stand-in for 'batch reached RUNNING'."""
        q = self._workers.get(name)
        if q is not None and q.isActive:
            q.processAllAvailable()
