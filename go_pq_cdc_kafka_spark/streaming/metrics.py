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
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

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


class MetricsServer:
    """Serve ``GET /metrics`` (Prometheus text) and ``GET /status`` from an
    :class:`EngineMetrics` on a daemon thread — the reference's HTTP API
    (README.md:272-276: /status returns 200 when the source connection is
    healthy; /metrics is the Prometheus endpoint).

    ``readiness`` is the health probe: the reference pings Postgres; the
    Spark analogue is typically ``lambda: query.isActive``. When it returns
    False (or raises), /status answers 503 — the shape a k8s readiness probe
    or the reference's load-balancer check expects. ``port=0`` binds an
    ephemeral port (read it back from ``.port``)."""

    def __init__(
        self,
        metrics: EngineMetrics,
        host: str = "127.0.0.1",
        port: int = 0,
        readiness: Callable[[], bool] | None = None,
    ) -> None:
        self.metrics = metrics
        self.host = host
        self.port = port
        self.readiness = readiness
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "MetricsServer":
        metrics, readiness = self.metrics, self.readiness

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, code: int, content_type: str, body: bytes) -> None:
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 - http.server API
                if self.path == "/metrics":
                    self._reply(
                        200,
                        "text/plain; version=0.0.4; charset=utf-8",
                        metrics.prometheus_text().encode(),
                    )
                elif self.path == "/status":
                    try:
                        ok = True if readiness is None else bool(readiness())
                    except Exception:  # noqa: BLE001 - probe failure == not ready
                        ok = False
                    payload = dict(metrics.status(), ready=ok)
                    self._reply(
                        200 if ok else 503,
                        "application/json",
                        json.dumps(payload).encode(),
                    )
                else:
                    self._reply(404, "text/plain", b"not found\n")

            def log_message(self, *args) -> None:  # silence per-request stderr
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="metrics-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


class SnapshotMetrics:
    """The reference's snapshot metric family, name-for-name
    (README.md:290-299: in_progress / total_tables / total_chunks /
    completed_chunks / total_rows / duration_seconds). The engine derives
    chunk progress from Spark task counts instead of hand-rolled claim
    rows, but the exposed surface is identical so existing dashboards
    transfer unchanged."""

    PREFIX = "go_pq_cdc_snapshot"

    def __init__(self, engine: "EngineMetrics") -> None:
        self._m = engine

    def started(self, total_tables: int, total_chunks: int) -> None:
        g = self._m.gauges
        with self._m._lock:
            g[f"{self.PREFIX}_in_progress"] = 1
            g[f"{self.PREFIX}_total_tables"] = total_tables
            g[f"{self.PREFIX}_total_chunks"] = total_chunks
            g[f"{self.PREFIX}_completed_chunks"] = 0

    def chunk_done(self, rows: int) -> None:
        with self._m._lock:
            self._m.gauges[f"{self.PREFIX}_completed_chunks"] = (
                self._m.gauges.get(f"{self.PREFIX}_completed_chunks", 0) + 1
            )
            self._m.counters[f"{self.PREFIX}_total_rows"] += rows

    def finished(self, duration_s: float) -> None:
        g = self._m.gauges
        with self._m._lock:
            g[f"{self.PREFIX}_in_progress"] = 0
            g[f"{self.PREFIX}_duration_seconds"] = duration_s


def checkpoint_position(checkpoint_dir: str) -> dict:
    """Inspect a streaming checkpoint's offset bookkeeping without a
    running query — the ops answer to "where is this pipeline in the WAL"
    (the reference serves the same from /status, README.md:270-276;
    Postgres-side the equivalent is pg_replication_slots.confirmed_flush).

    Returns ``{"planned_batch", "planned", "committed_batch", "committed"}``
    where ``planned`` is the newest offset written to ``offsets/`` (batch
    may still be running) and ``committed`` the offset of the newest batch
    in ``commits/`` (durable — safe to ack upstream). Offsets are the
    source's own JSON (``{"lsn": N}`` for pgwal/pgwire sources); None when
    the checkpoint has no entries yet."""
    import json as _json
    import os as _os

    def _entries(sub: str) -> dict[int, str]:
        d = _os.path.join(checkpoint_dir, sub)
        if not _os.path.isdir(d):
            return {}
        return {
            int(f): _os.path.join(d, f)
            for f in _os.listdir(d)
            if f.isdigit()
        }

    def _offset_of(path: str):
        # offset log format: "v1" line, metadata JSON line, then one
        # offset JSON line per source (single-source pipelines: one)
        with open(path, "r", encoding="utf-8") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        for ln in lines[2:]:
            try:
                return _json.loads(ln)
            except _json.JSONDecodeError:
                continue
        return None

    offsets = _entries("offsets")
    commits = _entries("commits")
    planned_batch = max(offsets) if offsets else None
    committed_batch = max(commits) if commits else None
    return {
        "planned_batch": planned_batch,
        "planned": _offset_of(offsets[planned_batch]) if planned_batch is not None else None,
        "committed_batch": committed_batch,
        "committed": (
            _offset_of(offsets[committed_batch])
            if committed_batch is not None and committed_batch in offsets
            else None
        ),
    }
