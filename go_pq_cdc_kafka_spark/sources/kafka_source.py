"""Kafka source — executor-parallel PySpark ``DataSource`` over the
from-scratch wire client (streaming/kafka_wire.py), format ``"kafkawire"``.

The reference is a one-way Postgres→Kafka connector; consuming the topics
it produces is the other half every deployment needs (audit readers,
re-materialization, backfills into the lake). Spark's own Kafka source
needs the spark-sql-kafka jar; this one needs nothing beyond the package.

Spark-first shape — this is NOT a driver-side reader:

- ``partitions(start, end)`` emits ONE InputPartition per Kafka partition;
  ``read()`` runs ON THE EXECUTORS, each task fetching only its partition's
  offset range over its own broker connection. Parallelism = topic
  partition count, exactly like the jar-backed source.
- offsets are ``{partition(str): next_offset}`` dicts; ``latestOffset`` is
  the broker high watermark via ListOffsets v1 (TS_LATEST), optionally
  clamped by ``maxoffsetspertrigger`` for bounded micro-batches.
- schema mirrors the jar-backed source (key/value binary, topic, partition,
  offset, timestamp, headers), so pipelines written against one run on the
  other unchanged.

Options: ``bootstrap`` (required), ``topic`` (required unless
``subscribe``/``assign`` given — a single topic or a comma list;
``subscribe`` is an accepted alias; ``assign`` = jar-style explicit
assignment JSON {"topic": [0, 2]} reading only the listed partitions;
with several topics the stream's offset keys become ``topic/partition``
while explicit offset JSON nests per topic, jar-source style),
``minpartitions`` (split offset ranges into at least this many input
partitions, decoupling read parallelism from the topic's partition
count),
``startingoffsets`` = earliest|latest|committed|{"part": offset} JSON
(default earliest; JSON sentinels match the jar source: -1 = that
partition's latest, -2 = earliest; ``committed`` resumes from the
group's broker-stored OffsetCommit positions — checkpoint-free restart —
and requires ``group.id``), ``group.id`` (commit each batch's end
offsets broker-side via OffsetCommit, for lag monitoring and
``committed`` resume), ``auto.offset.reset`` = earliest|latest (fallback
for partitions the group never committed), ``startingtimestamp`` (epoch
millis; partitions with nothing at-or-after it start at their latest —
the broker's -1 answer is normalized), ``maxoffsetspertrigger`` (honored
from batch 0 on a fresh query, distributed across partitions
proportionally to their lag like the jar source; a restart's WAL-replay
batch is Spark's, not ours; with ``availableNow`` triggers the clamped
first answer becomes the run's END TARGET — the Python DataSource API
has no ReadLimit channel, so an availableNow run processes ONE
trigger's worth, not the whole backlog; use a processingTime trigger
for rate-limited backlog drains),
``subscribepattern`` (regex FULL-matched against the broker's topic
listing, mutually exclusive with topic/subscribe/assign like the jar
source; must match >= 1 topic at start; the stream re-resolves the
pattern every micro-batch plan, so later-created matching topics join
the subscription with their offset keys always ``topic/partition``-
qualified),
``minoffsetspertrigger`` + ``maxtriggerdelay`` (jar parity: plan an
EMPTY micro-batch until at least N new offsets accumulate or the delay —
default 15m, duration syntax "30s"/"15m"/plain ms — expires; the clock
is driver wall time, best-effort across restarts like the jar source;
batch 0 of a fresh query is never held back),
``failondataloss`` (default true: a fetch that lands below the broker's
log-start — retention or DeleteRecords removed the offsets while the
query was down or between plan and fetch — fails the query with the
offset range that was lost; false: skip to the broker's earliest with a
logged warning, jar-source contract),
``sasl.mechanism``/``sasl.username``/``sasl.password``,
``tls`` = true + ``tls.rootca`` (path) / ``tls.rootcapem`` (inline PEM).
"""

from __future__ import annotations

import re

from datetime import datetime, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def kafka_record_schema() -> StructType:
    """The jar-backed Kafka source's schema, headers included."""
    return StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField(
                "headers",
                ArrayType(
                    StructType(
                        [
                            StructField("key", StringType()),
                            StructField("value", BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )


def _isolation(options: dict) -> int:
    """0 = read_uncommitted (default), 1 = read_committed — same values
    and semantics as the jar source's ``kafka.isolation.level``."""
    level = options.get("isolationlevel", "read_uncommitted").lower()
    if level not in ("read_uncommitted", "read_committed"):
        raise ValueError(
            f"invalid isolationlevel {level!r} "
            "(read_uncommitted or read_committed)"
        )
    return 1 if level == "read_committed" else 0


def _client_kwargs(options: dict) -> dict:
    kw: dict = {"bootstrap": options["bootstrap"]}
    mech = options.get("sasl.mechanism")
    if mech:
        kw["sasl"] = (
            mech,
            options.get("sasl.username", ""),
            options.get("sasl.password", ""),
        )
    if options.get("tls", "").lower() in ("true", "1", "yes"):
        kw["tls"] = {
            "root_ca_path": options.get("tls.rootca") or None,
            "root_ca_pem": options.get("tls.rootcapem") or None,
        }
    return kw


def _split_ranges(parts: list, min_partitions: int | None) -> list:
    """Split offset ranges so at least ``min_partitions`` non-empty input
    partitions exist (jar-source minPartitions semantics): read
    parallelism stops being capped by the TOPIC's partition count — the
    knob that matters when 3 Kafka partitions hold a backlog a
    1000-core cluster should scan. Ranges split proportionally to their
    size; every split is a contiguous offset slice, so per-range fetches
    stay sequential."""
    if not min_partitions or len(parts) >= min_partitions:
        return parts
    sized = [(pt, pt.end - pt.start) for pt in parts]
    total = sum(n for _, n in sized)
    if total <= 0:
        return parts
    out = []
    for pt, n in sized:
        if n <= 0:
            out.append(pt)
            continue
        pieces = max(1, min(round(n * min_partitions / total), n))
        step = (n + pieces - 1) // pieces
        pos = pt.start
        while pos < pt.end:
            hi = min(pos + step, pt.end)
            out.append(
                _RangePartition(pt.topic, pt.partition, pos, hi,
                                pt.client_kwargs, pt.isolation,
                                pt.fail_on_data_loss)
            )
            pos = hi
    return out


class _RangePartition(InputPartition):
    def __init__(self, topic: str, partition: int, start: int, end: int,
                 client_kwargs: dict, isolation: int = 0,
                 fail_on_data_loss: bool = True):
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end
        self.client_kwargs = client_kwargs
        self.isolation = isolation
        self.fail_on_data_loss = fail_on_data_loss


def _read_range(part: _RangePartition) -> Iterator[tuple]:
    """Executor-side fetch loop over [start, end)."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        ERR_OFFSET_OUT_OF_RANGE,
        KafkaProtocolError,
    )

    if part.end <= part.start:
        return
    with KafkaWireConsumer(**part.client_kwargs) as cons:
        pos = part.start
        while pos < part.end:
            try:
                recs, hwm = cons.fetch(
                    part.topic, part.partition, pos,
                    isolation_level=part.isolation,
                )
            except KafkaProtocolError as e:
                if e.code != ERR_OFFSET_OUT_OF_RANGE:
                    raise
                # requested offsets no longer exist (retention /
                # DeleteRecords ran between planning and fetch, or while
                # the query was down) — jar-source failOnDataLoss contract
                earliest = cons.earliest_offsets(part.topic).get(
                    part.partition, pos
                )
                if part.fail_on_data_loss:
                    raise RuntimeError(
                        f"data loss on {part.topic}[{part.partition}]: "
                        f"offsets [{pos}, {min(part.end, earliest)}) were "
                        f"deleted by the broker (log starts at {earliest})."
                        " Set failondataloss=false to skip missing offsets"
                        " instead of failing."
                    ) from e
                if earliest <= pos:
                    # out-of-range ABOVE the log (shrunk/recreated topic):
                    # nothing at or after pos survives
                    import logging

                    logging.getLogger(__name__).warning(
                        "kafkawire: %s[%d] offsets from %d no longer exist"
                        " (log truncated); skipping remainder of range",
                        part.topic, part.partition, pos,
                    )
                    return
                import logging

                logging.getLogger(__name__).warning(
                    "kafkawire: skipping deleted offsets [%d, %d) on"
                    " %s[%d] (failondataloss=false)",
                    pos, earliest, part.topic, part.partition,
                )
                pos = earliest
                continue
            if not recs:
                nxt = cons._fetch_next_offset
                if nxt is not None and nxt > pos:
                    # the window held only control markers / filtered
                    # aborted batches — advance past them, don't refetch
                    pos = nxt
                    continue
                if hwm <= pos:
                    break  # range ran past a shrunk log: emit what exists
                continue
            for rec in recs:
                if rec.offset >= part.end:
                    return
                ts = datetime.fromtimestamp(
                    rec.timestamp_ms / 1000.0, tz=timezone.utc
                )
                yield (
                    rec.key,
                    rec.value,
                    part.topic,
                    part.partition,
                    rec.offset,
                    ts,
                    rec.headers,
                )
            pos = max(r.offset for r in recs) + 1


def _parse_topics(options: dict) -> list[str]:
    given = [
        k for k in ("assign", "subscribe", "topic", "subscribepattern")
        if options.get(k)
    ]
    if len(given) > 1 and set(given) != {"subscribe", "topic"}:
        # jar parity: assign / subscribe / subscribePattern are mutually
        # exclusive subscription modes (topic is our subscribe alias)
        raise ValueError(
            f"only one of assign/subscribe/subscribepattern may be set, got {given}"
        )
    assign = options.get("assign")
    if assign:
        import json

        return sorted(json.loads(assign))
    pattern = options.get("subscribepattern")
    if pattern:
        return _resolve_pattern(pattern, _client_kwargs(options))
    spec = options.get("subscribe") or options.get("topic")
    if not spec:
        raise ValueError(
            "kafkawire requires a topic, subscribe, subscribepattern, "
            "or assign option"
        )
    topics = [t.strip() for t in spec.split(",") if t.strip()]
    if not topics:
        raise ValueError("no topics in topic/subscribe option")
    return topics


def _match_pattern(names: list[str], pattern: str) -> list[str]:
    import re

    rx = re.compile(pattern)
    # full-match, like the jar source (java Pattern.matcher().matches())
    return sorted(n for n in names if rx.fullmatch(n))


def _resolve_pattern(pattern: str, client_kwargs: dict) -> list[str]:
    """Broker-side resolution of ``subscribepattern``: list every
    (non-internal) topic, keep full-regex matches. The source requires at
    least one match AT START (a loud error beats a silently idle stream);
    topics created later that match are picked up by the stream reader's
    per-batch re-resolution in ``_latest_all``."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireClient

    with KafkaWireClient(**client_kwargs) as c:
        topics = _match_pattern(c.all_topic_names(), pattern)
    if not topics:
        raise ValueError(f"subscribepattern {pattern!r} matched no topics")
    return topics


def _duration_ms(spec: str) -> int:
    """Jar-style duration: plain int = milliseconds, or <n><unit> with
    unit in ms/s/m/h (e.g. "15m", "30s")."""
    spec = spec.strip().lower()
    m = re.fullmatch(r"(\d+)\s*(ms|s|m|h)?", spec)
    if not m:
        raise ValueError(f"unparseable duration {spec!r}")
    n = int(m.group(1))
    return n * {None: 1, "ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}[
        m.group(2)
    ]


def _fail_on_data_loss(options: dict) -> bool:
    return options.get("failondataloss", "true").strip().lower() not in (
        "false", "0", "no"
    )


def _parse_assignment(options: dict) -> dict | None:
    """``assign`` = jar-style explicit assignment JSON
    {"topic": [0, 2], ...}: only the listed partitions are read."""
    assign = options.get("assign")
    if not assign:
        return None
    import json

    return {t: set(int(p) for p in ps) for t, ps in json.loads(assign).items()}


class KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.topics = _parse_topics(options)
        self.pattern = options.get("subscribepattern")
        self.assignment = _parse_assignment(options)
        self.client_kwargs = _client_kwargs(options)
        self.min_partitions = int(options.get("minpartitions", 0)) or None
        self.isolation = _isolation(options)
        self.max_per_trigger = int(options.get("maxoffsetspertrigger", 0)) or None
        self.min_per_trigger = int(options.get("minoffsetspertrigger", 0)) or None
        # jar default: wait at most 15 minutes for minoffsetspertrigger
        self.max_trigger_delay_ms = _duration_ms(
            options.get("maxtriggerdelay", "15m")
        )
        self.fail_on_data_loss = _fail_on_data_loss(options)
        self.group_id = options.get("group.id")
        self._driver_client = None
        self._position: dict | None = None  # last planned end (rate limiting)
        self._last_trigger_ms: float | None = None  # minoffsets wait clock

    # Offset-dict keys: bare partition numbers for a single topic (stable
    # with pre-multi-topic checkpoints), "topic/partition" when subscribed
    # to several ('/' is not a legal Kafka topic character).
    # (pattern subscriptions always qualify: the matched set can GROW
    # mid-query, and a 1->2 topic transition must not change key format
    # under a live checkpoint)
    def _okey(self, topic: str, p: int) -> str:
        if len(self.topics) == 1 and not self.pattern:
            return str(p)
        return f"{topic}/{p}"

    def _parse_okey(self, key: str) -> tuple[str, int]:
        if len(self.topics) == 1 and not self.pattern:
            return self.topics[0], int(key)
        topic, _, p = key.rpartition("/")
        return topic, int(p)

    def _client(self):
        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        if self._driver_client is None:
            self._driver_client = KafkaWireConsumer(**self.client_kwargs)
        return self._driver_client

    def _starting_offsets(self) -> dict:
        """The CONFIGURED start position, {offset key: offset} — shared by
        initialOffset and the fresh-start rate-limit seed."""
        import json

        c = self._client()
        ts = self.options.get("startingtimestamp")
        starting = self.options.get("startingoffsets", "earliest")
        if ts is not None and starting.lower() != "earliest":
            # the jar source rejects conflicting start-position options;
            # silently preferring one would surprise whoever set both.
            raise ValueError(
                "startingtimestamp cannot be combined with a non-default "
                f"startingoffsets (got startingoffsets={starting!r})"
            )
        explicit_by_topic: dict | None = None
        if starting.lstrip().startswith("{"):
            parsed = json.loads(starting)
            if parsed and all(isinstance(v, dict) for v in parsed.values()):
                explicit_by_topic = {
                    t: {int(p): int(o) for p, o in per.items()}
                    for t, per in parsed.items()
                }
            elif len(self.topics) == 1:
                # flat {"part": off} shorthand for the single-topic case
                explicit_by_topic = {
                    self.topics[0]: {int(p): int(o) for p, o in parsed.items()}
                }
            else:
                raise ValueError(
                    "multi-topic startingoffsets JSON must be nested "
                    '{"topic": {"part": offset}}'
                )

        out: dict[str, int] = {}
        for topic in self.topics:
            if starting.lower() == "committed":
                # resume from the group's broker-stored commits
                # (OffsetFetch): checkpoint-free restart, the
                # consumer-group migration shape. Partitions the group
                # never committed fall back to auto.offset.reset
                # (earliest default, like the jar source).
                if not self.group_id:
                    raise ValueError(
                        'startingoffsets="committed" requires the group.id '
                        "option"
                    )
                reset = self.options.get(
                    "auto.offset.reset", "earliest"
                ).lower()
                offs = (
                    c.latest_offsets(topic)
                    if reset == "latest"
                    else c.earliest_offsets(topic)
                )
                committed = c.fetch_committed(
                    self.group_id, topic, sorted(offs)
                )
                for pp, o in committed.items():
                    if o >= 0:
                        offs[pp] = o
            elif ts is not None:
                # first offset with record timestamp >= ts (epoch millis).
                # A REAL broker's ListOffsets v1 answers -1 for partitions
                # with nothing that recent (MiniBroker conforms) —
                # normalize -1 to the latest offset so the first fetch
                # never runs at offset -1.
                offs = c.offsets_for_timestamp(topic, int(ts))
                if any(o < 0 for o in offs.values()):
                    latest = c.latest_offsets(topic)
                    offs = {
                        pp: (latest[pp] if o < 0 else o)
                        for pp, o in offs.items()
                    }
            elif explicit_by_topic is not None:
                # explicit per-partition positions, jar-source style;
                # unlisted partitions start earliest. Sentinels: -1 =
                # latest, -2 = earliest.
                offs = c.earliest_offsets(topic)
                latest = None
                for pp, o in explicit_by_topic.get(topic, {}).items():
                    if o == -2:
                        continue  # earliest — already the default fill
                    if o == -1:
                        if latest is None:
                            latest = c.latest_offsets(topic)
                        offs[pp] = latest.get(pp, 0)
                    else:
                        offs[pp] = o
            elif starting.lower() == "latest":
                offs = c.latest_offsets(topic)
            else:
                offs = c.earliest_offsets(topic)
            allowed = (
                self.assignment.get(topic) if self.assignment else None
            )
            for pp, o in offs.items():
                if allowed is None or pp in allowed:
                    out[self._okey(topic, pp)] = int(o)
        return out

    def _latest_all(self) -> dict:
        # read_committed planning asks for the LAST STABLE OFFSET
        # (ListOffsets v2 isolation), so a batch end never lands inside
        # an open transaction the fetch would then withhold forever
        c = self._client()
        if self.pattern:
            # jar parity: pattern subscriptions discover topics created
            # after the query started (one Metadata round trip per plan);
            # new topics' partitions start at 0/earliest (partitions()
            # defaults a missing start key to 0). The set never shrinks —
            # dropping a checkpointed topic under a live query would
            # regress its offsets.
            for t in _match_pattern(c.all_topic_names(), self.pattern):
                if t not in self.topics:
                    self.topics.append(t)
            self.topics.sort()
        out = {}
        for t in self.topics:
            allowed = self.assignment.get(t) if self.assignment else None
            for p, o in c.latest_offsets(t, self.isolation).items():
                if allowed is None or p in allowed:
                    out[self._okey(t, p)] = o
        return out

    def initialOffset(self) -> dict:
        offs = self._starting_offsets()
        if self._position is None:
            self._position = dict(offs)
        return offs

    def latestOffset(self) -> dict:
        import time as _time

        out = self._latest_all()
        if self.min_per_trigger and self._position is not None:
            # jar parity (minOffsetsPerTrigger + maxTriggerDelay): plan an
            # empty batch until enough new offsets accumulate, unless the
            # delay clock expires — driver wall clock, best-effort across
            # restarts, exactly like the jar source.
            lag = sum(
                max(int(o) - int(self._position.get(k, 0)), 0)
                for k, o in out.items()
            )
            now_ms = _time.time() * 1000.0
            if self._last_trigger_ms is None:
                self._last_trigger_ms = now_ms
            if lag < self.min_per_trigger and (
                now_ms - self._last_trigger_ms < self.max_trigger_delay_ms
            ):
                return {k: int(self._position.get(k, 0)) for k in out}
            self._last_trigger_ms = now_ms
        if self.max_per_trigger:
            if self._position is None:
                # First probe of a FRESH query: the runner asks for the
                # first batch's end BEFORE calling initialOffset (observed
                # call order), so clamp from the CONFIGURED start — batch 0
                # must honor maxoffsetspertrigger too (startingoffsets=
                # earliest on a big topic otherwise reads the whole log in
                # one unclamped micro-batch). This cannot regress a
                # RESTARTED query's offset log: on restart (probed on
                # Spark 4.1.2 for BOTH processingTime and availableNow
                # triggers, committed AND uncommitted final batches) Spark
                # replays the checkpointed batch through
                # partitions(start, end) before ever calling latestOffset,
                # which seeds _position with the checkpoint position (see
                # partitions(); locked in by
                # test_restart_rate_limit_no_duplicates). Belt-and-braces
                # for any future planner that skips that replay: with
                # group.id set, lift the seed to the group's broker
                # commits, so a clamped end can lag the checkpoint by at
                # most the one never-committed final batch instead of the
                # whole log.
                seed = self._starting_offsets()
                if self.group_id:
                    for topic in self.topics:
                        parts = sorted(
                            self._parse_okey(k)[1]
                            for k in seed
                            if self._parse_okey(k)[0] == topic
                        )
                        try:
                            committed = self._client().fetch_committed(
                                self.group_id, topic, parts
                            )
                        except Exception:
                            committed = {}
                        for pp, o in committed.items():
                            k = self._okey(topic, pp)
                            if k in seed and o > seed[k]:
                                seed[k] = int(o)
                self._position = seed
            # distribute the trigger budget PROPORTIONALLY to each
            # partition's lag (jar-source semantics) — an even split
            # starves the laggy partition while idle partitions waste
            # their share. Every lagging partition advances by >= 1 so
            # none can be starved entirely by rounding.
            lags = {
                k: max(o - int(self._position.get(k, 0)), 0)
                for k, o in out.items()
            }
            total_lag = sum(lags.values())
            if total_lag > self.max_per_trigger:
                for k, o in out.items():
                    if lags[k] == 0:
                        continue
                    share = max(
                        lags[k] * self.max_per_trigger // total_lag, 1
                    )
                    out[k] = min(o, int(self._position.get(k, 0)) + share)
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Doubles as the restart position seed: Spark re-plans the last
        # checkpointed batch through here before the first post-restart
        # latestOffset, so the rate-limit clamp base is always the
        # authoritative WAL end from then on.
        self._position = {k: int(end[k]) for k in end}
        out = []
        for k in sorted(end):
            topic, p = self._parse_okey(k)
            out.append(
                _RangePartition(
                    topic, p, int(start.get(k, 0)), int(end[k]),
                    self.client_kwargs, self.isolation,
                    self.fail_on_data_loss,
                )
            )
        return _split_ranges(out, self.min_partitions)

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # Positions live in the Spark checkpoint; with group.id set they
        # are ALSO committed broker-side, so external monitoring sees lag
        # and startingoffsets="committed" can resume without the
        # checkpoint. Spark delivers commit(N) only when batch N+1 is
        # planned, so broker commits lag one batch and the final batch
        # before a stop is never committed — committed-resume is
        # AT-LEAST-ONCE (re-reads that tail), the same contract a plain
        # Kafka consumer group gives. Commit failure must not fail the
        # query — the checkpoint stays authoritative — but silent failure
        # leaves lag dashboards and committed-resume positions stale with
        # no trace, so log a warning (rate-limited to one per minute).
        if self.group_id:
            by_topic: dict[str, dict[int, int]] = {}
            for k, o in end.items():
                topic, p = self._parse_okey(k)
                by_topic.setdefault(topic, {})[p] = int(o)
            for topic, offs in by_topic.items():
                try:
                    self._client().commit_offsets(
                        self.group_id, topic, offs
                    )
                except Exception as exc:
                    import logging
                    import time

                    now = time.monotonic()
                    if now - getattr(self, "_commit_warn_ts", 0.0) >= 60.0:
                        self._commit_warn_ts = now
                        logging.getLogger(__name__).warning(
                            "broker OffsetCommit failed for group %r topic "
                            "%r (query unaffected; checkpoint is "
                            "authoritative, but broker-side lag/committed "
                            "positions are stale): %s",
                            self.group_id, topic, exc,
                        )

    def stop(self) -> None:
        if self._driver_client is not None:
            self._driver_client.close()
            self._driver_client = None


class KafkaWireBatchReader(DataSourceReader):
    """Batch read: a consistent snapshot taken at plan time, fetched
    executor-parallel, across one or many topics (comma list / the
    ``subscribe`` alias). ``startingoffsets``/``endingoffsets`` bound the
    range like the jar source's batch mode: earliest|latest|explicit JSON
    with the -1/-2 sentinels ({"part": off} for one topic,
    {"topic": {"part": off}} for several), default earliest→latest.
    ``startingoffsets="committed"`` (with ``group.id``) resumes from the
    group's broker-stored positions — the batch leg of the exactly-once
    consume-transform-produce loop (pipeline.write_kafka_wire_eos), where
    each produce transaction advances those positions atomically with its
    output."""

    def __init__(self, options: dict):
        self.topics = _parse_topics(options)
        self.assignment = _parse_assignment(options)
        self.options = dict(options)
        self.client_kwargs = _client_kwargs(options)
        self.min_partitions = int(options.get("minpartitions", 0)) or None
        self.isolation = _isolation(options)

    def partitions(self) -> Sequence[InputPartition]:
        import json

        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        out: list[_RangePartition] = []
        with KafkaWireConsumer(**self.client_kwargs) as c:
            specs = {}
            for opt in ("startingoffsets", "endingoffsets"):
                spec = self.options.get(opt)
                if spec is not None and spec.lstrip().startswith("{"):
                    parsed = json.loads(spec)
                    if parsed and all(
                        isinstance(v, dict) for v in parsed.values()
                    ):
                        specs[opt] = {
                            t: {int(pp): int(o) for pp, o in per.items()}
                            for t, per in parsed.items()
                        }
                    elif len(self.topics) == 1:
                        specs[opt] = {
                            self.topics[0]: {
                                int(pp): int(o) for pp, o in parsed.items()
                            }
                        }
                    else:
                        raise ValueError(
                            f"multi-topic {opt} JSON must be nested "
                            '{"topic": {"part": offset}}'
                        )
                else:
                    specs[opt] = spec  # None / "earliest" / "latest"

            for topic in self.topics:
                earliest = c.earliest_offsets(topic)
                latest = c.latest_offsets(topic, self.isolation)

                def resolve(opt: str, default: dict) -> dict:
                    spec = specs[opt]
                    if spec is None:
                        return dict(default)
                    if isinstance(spec, dict):
                        res = dict(default)
                        for pp, o in spec.get(topic, {}).items():
                            if o == -2:
                                res[pp] = earliest.get(pp, 0)
                            elif o == -1:
                                res[pp] = latest.get(pp, 0)
                            else:
                                res[pp] = o
                        return res
                    if spec.lower() == "latest":
                        return dict(latest)
                    if spec.lower() == "earliest":
                        return dict(earliest)
                    if (
                        spec.lower() == "committed"
                        and opt == "startingoffsets"
                    ):
                        # group's broker-stored positions (stream-reader
                        # parity); partitions the group never committed
                        # fall back to auto.offset.reset
                        group = self.options.get("group.id")
                        if not group:
                            raise ValueError(
                                'startingoffsets="committed" requires the '
                                "group.id option"
                            )
                        reset = self.options.get(
                            "auto.offset.reset", "earliest"
                        ).lower()
                        fallback = latest if reset == "latest" else earliest
                        res = dict(fallback)
                        for pp, o in c.fetch_committed(
                            group, topic, sorted(latest)
                        ).items():
                            if o >= 0:
                                res[pp] = o
                        return res
                    raise ValueError(f"invalid {opt}: {spec!r}")

                start = resolve("startingoffsets", earliest)
                end = resolve("endingoffsets", latest)
                allowed = (
                    self.assignment.get(topic) if self.assignment else None
                )
                out.extend(
                    _RangePartition(topic, pp, start.get(pp, 0), end[pp],
                                    self.client_kwargs, self.isolation,
                                    _fail_on_data_loss(self.options))
                    for pp in sorted(end)
                    if allowed is None or pp in allowed
                )
        return _split_ranges(out, self.min_partitions)

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkawire"

    def schema(self) -> StructType:
        return kafka_record_schema()

    def reader(self, schema: StructType) -> KafkaWireBatchReader:
        return KafkaWireBatchReader(self.options)

    def streamReader(self, schema: StructType) -> KafkaWireStreamReader:
        return KafkaWireStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)
