"""Observability — the reference's Prometheus surface (kafka/producer/
metric.go:12-111, README.md:278-299) rebuilt on StreamingQueryListener.

Reference metrics reproduced:

- process latency gauge (event-time → enqueue, producer_batch.go:97-99)
  → micro-batch ``batchDuration`` / event-time lag from progress
- bulk request latency gauge (producer_batch.go:115-118)
  → sink ``addBatch`` duration from ``durationMs``
- per-topic write_total / err_total counters
  → ``numOutputRows`` accumulation + onQueryTerminated(exception)
- snapshot gauges → source progress (numInputRows, inputRowsPerSecond)
"""

from __future__ import annotations

import json
import threading
from collections import defaultdict
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

_PREFIX = "go_pq_cdc_kafka_spark"


class EngineMetrics(StreamingQueryListener):
    """Collects per-query progress into Prometheus-style counters/gauges."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}
        self.last_progress: dict[str, Any] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.counters[f"{_PREFIX}_query_started_total"] += 1

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        name = p.get("name") or p.get("id", "query")
        dur = p.get("durationMs", {}) or {}
        with self._lock:
            self.last_progress[name] = p
            self.counters[f"{_PREFIX}_write_total{{query=\"{name}\"}}"] += p.get(
                "sink", {}
            ).get("numOutputRows", 0) or 0
            self.gauges[f"{_PREFIX}_process_latency_ms{{query=\"{name}\"}}"] = sum(
                v for v in dur.values() if isinstance(v, (int, float))
            )
            self.gauges[
                f"{_PREFIX}_bulk_request_process_latency_ms{{query=\"{name}\"}}"
            ] = dur.get("addBatch", 0) or 0
            self.gauges[f"{_PREFIX}_input_rows_per_second{{query=\"{name}\"}}"] = (
                p.get("inputRowsPerSecond", 0.0) or 0.0
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - passthrough
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            if getattr(event, "exception", None):
                self.counters[f"{_PREFIX}_err_total"] += 1
            self.counters[f"{_PREFIX}_query_terminated_total"] += 1

    # -- exposition ---------------------------------------------------------
    def prometheus_text(self) -> str:
        """Render in Prometheus text exposition format (the reference exposes
        /metrics, README.md:270-276)."""
        with self._lock:
            lines = []
            for k, v in sorted(self.counters.items()):
                lines.append(f"# TYPE {k.split('{')[0]} counter")
                lines.append(f"{k} {v}")
            for k, v in sorted(self.gauges.items()):
                lines.append(f"# TYPE {k.split('{')[0]} gauge")
                lines.append(f"{k} {v}")
            return "\n".join(lines) + "\n"

    def status(self) -> dict[str, Any]:
        """/status equivalent (M2)."""
        with self._lock:
            return {
                "queries": list(self.last_progress),
                "counters": dict(self.counters),
            }
