"""Custom Python data sources (Spark 4 DataSource API): a deterministic
synthetic events generator (batch + streaming), a partition-parallel
paged-JSONL ingest source, and a two-phase-commit JSONL audit sink.

The reference feeds its pipeline from driver-side scripts — a serial
HTTP download (``scripts/fetch_data.py:12-26``) and a collect-to-CSV
slicer (``scripts/simulate_stream.py:21-33``) — so data has to exist on
disk before anything can run, fetched one file at a time on one machine.
These sources move all of that inside Spark executors:

``synthetic_events`` generates the ``events`` fixture schema directly:

* **batch**: ``spark.read.format("synthetic_events")`` — each of
  ``n_partitions`` input partitions generates its own row range as Arrow
  RecordBatches (vectorized numpy, zero driver data, zero storage). Row
  values are pure functions of the global row index, so the dataset is
  byte-identical regardless of partitioning — load-testing a pipeline at
  any scale costs no storage at all.
* **filter pushdown**: ``pushFilters`` narrows the generated ``event_id``
  range for ``<``/``<=``/``>``/``>=``/``=`` predicates, so
  ``.filter(col("event_id") < 1000)`` generates 1 000 rows, not
  ``n_rows`` — the Python-source analog of parquet predicate pushdown.
* **streaming**: ``spark.readStream.format("synthetic_events")`` — a
  replayable micro-batch source built on ``SimpleDataSourceStreamReader``.
  Offsets are row indexes; Spark hands ``read(start)`` the checkpointed
  offset, so a restarted query resumes exactly where it stopped with NO
  driver-side state to lose (the restart-safety problem a stateful
  ``latestOffset`` implementation has). ``readBetweenOffsets`` replays any
  range deterministically — exactly-once by construction.

Rows match the ``events`` fixture schema (event_id, ts, user_id,
event_type, value, props) with ``ts`` as TIMESTAMP_NTZ — the same type
the driver-generated parquet carries.

``paged_jsonl`` turns a paged dump (``url_template.format(page=i)``)
into one input partition per page, fetched and parsed executor-side —
cluster-parallel ingest where the reference looped on the driver.

``jsonl_audit`` is the sink half: staged per-task files published behind
an atomic per-batch manifest (two-phase commit), replay-safe under
streaming restarts.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ("view", "click", "purchase", "login", "logout")
_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


def _gen_arrow(lo: int, hi: int, n_users: int, step_us: int):
    """Rows [lo, hi) as one Arrow RecordBatch. Every column is a pure
    function of the global row index — no RNG object, no partition
    state — so any (re)partitioning of the index space yields the same
    rows (property-tested) and streaming replay is exact."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(lo, hi, dtype=np.int64)
    # Knuth multiplicative hashing scrambles the index into user ids and
    # event-type picks; masks keep everything in non-negative int range
    user = ((i * 2654435761) & 0x7FFFFFFF) % n_users
    etype = np.array(EVENT_TYPES)[((i * 40503) & 0x7FFFFFFF) % len(EVENT_TYPES)]
    value = ((i * 1103515245 + 12345) & 0x7FFFFFFF) / 0x7FFFFFFF * 100.0
    ts = _EPOCH_2024_US + i * step_us
    props = np.char.add(
        np.char.add('{"session":', (i // 16).astype("U20")), "}"
    )
    return pa.record_batch(
        [
            pa.array(i),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(user),
            pa.array(etype),
            pa.array(np.round(value, 4)),
            pa.array(props),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 100))
        self.step_us = int(options.get("step_us", 1_000_000))
        # index bounds narrowed by pushFilters
        self.lo, self.hi = 0, self.n_rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Fold event_id comparisons into the generated index range;
        every other filter is returned for Spark to re-apply. event_id
        equals the row index, so range narrowing is exact. (Materialized
        eagerly — a lazy generator would defer the range updates until
        Spark drains it, racing ``partitions()``.)"""
        unsupported: list[Filter] = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            if attr == ("event_id",) and isinstance(value, int):
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, value)
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, value)
                    self.hi = min(self.hi, value + 1)
                else:
                    unsupported.append(f)
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        n = max(1, min(self.n_partitions, span or 1))
        step = -(-span // n) if span else 1
        return [
            _RangePartition(p_lo, min(p_lo + step, hi))
            for p_lo in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        if partition.hi > partition.lo:
            yield _gen_arrow(
                partition.lo, partition.hi, self.n_users, self.step_us
            )


class _StreamReader(SimpleDataSourceStreamReader):
    """Offsets are row indexes: ``{"index": n}`` means rows [0, n) have
    been emitted. Spark passes the checkpointed offset into ``read``, so
    restart continuity needs no state here."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1_000_000))
        self.n_users = int(options.get("n_users", 100))
        self.step_us = int(options.get("step_us", 1_000_000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        if hi <= lo:
            return iter(())
        batch = _gen_arrow(lo, hi, self.n_users, self.step_us)
        cols = [c.to_pylist() for c in batch.columns]
        return iter(list(zip(*cols)))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["index"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return self._rows(lo, hi), {"index": max(lo, hi)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["index"], end["index"])


class SyntheticEventsDataSource(DataSource):
    """``synthetic_events`` — register with
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options (batch): ``n_rows``, ``n_partitions``, ``n_users``,
    ``step_us``. Options (streaming): ``rows_per_batch``, ``max_rows``,
    ``n_users``, ``step_us``.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(dict(self.options))

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(dict(self.options))


class _PagePartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class _PagedJsonlReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self.url_template = options["url_template"]
        if "{page}" not in self.url_template:
            raise ValueError(
                "paged_jsonl url_template must contain a {page} placeholder "
                "— without one every partition would fetch the SAME url and "
                "silently duplicate the dataset pages-fold"
            )
        self.pages = int(options.get("pages", 1))
        self.timeout_s = float(options.get("timeout_s", 60))
        self.schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PagePartition(self.url_template.format(page=p))
            for p in range(self.pages)
        ]

    def read(self, partition: _PagePartition):
        import json
        from urllib.request import urlopen

        fields = [f.name for f in self.schema.fields]
        # explicit timeout: urlopen's default is NO socket timeout, and a
        # server that accepts the connection but never responds would wedge
        # the task (and the job) forever
        with urlopen(partition.url, timeout=self.timeout_s) as resp:
            for line in resp.read().decode("utf-8").splitlines():
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(f) for f in fields)


class PagedJsonlDataSource(DataSource):
    """``paged_jsonl`` — partition-parallel paged ingest: the
    engine-shaped generalization of the reference's serial driver-side
    HTTP download (``scripts/fetch_data.py:12-26``). Each page URL
    (``url_template.format(page=i)``) becomes one input partition
    fetched and parsed ON AN EXECUTOR, so a 10 000-page dump downloads
    with cluster parallelism instead of a driver loop; a declared schema
    is required (field order = column order, missing keys → NULL).
    Options: ``url_template`` (with ``{page}``), ``pages``.

    Use ``.schema(...)`` on the reader; supports http(s) and file URLs
    (tests use ``file://``)."""

    @classmethod
    def name(cls) -> str:
        return "paged_jsonl"

    def schema(self) -> str:
        raise NotImplementedError(
            "paged_jsonl requires an explicit .schema(...) — remote pages "
            "should not be fetched twice just to infer one"
        )

    def reader(self, schema) -> _PagedJsonlReader:
        return _PagedJsonlReader(dict(self.options), schema)


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


class _JsonlWriterBase:
    """Two-phase commit shared by the batch and streaming JSONL writers.

    Executors serialize their partition to a UNIQUELY-NAMED file under
    ``<path>/.staged/`` (phase 1, idempotent: a retried task writes a new
    file; losers are never referenced). The driver's ``commit`` moves the
    winning files into the root and records a manifest (phase 2). Readers
    only ever see files a manifest names — a crash between the phases
    leaves staged garbage, never a torn dataset. On local[...] the shared
    filesystem makes the rename trivial; on a real cluster ``path`` must
    be shared storage (same contract as every Spark file sink)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _StagedFile:
        import json
        import os
        import uuid

        staged_dir = os.path.join(self.path, ".staged")
        os.makedirs(staged_dir, exist_ok=True)
        out = os.path.join(staged_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                # recursive=True: nested struct/array-of-struct columns
                # become plain dicts/lists; a bare asDict would leave Row
                # objects for default=str to mangle into repr strings
                f.write(
                    json.dumps(row.asDict(recursive=True), default=str) + "\n"
                )
                n += 1
        return _StagedFile(path=out, rows=n)

    def _publish(self, messages, manifest_name: str) -> None:
        import json
        import os

        commits = os.path.join(self.path, "_commits")
        os.makedirs(commits, exist_ok=True)
        manifest = os.path.join(commits, manifest_name)
        if os.path.exists(manifest):
            # replayed batch (streaming restart): the data is already
            # published — discard the replay's staged files, add nothing
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            return
        published, rows = [], 0
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, final)
            published.append(os.path.basename(final))
            rows += m.rows
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": published, "rows": rows}, f)
        os.replace(tmp, manifest)

    def abort(self, messages, *_args) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlBatchWriter(_JsonlWriterBase, DataSourceWriter):
    """Every batch write publishes under a FRESH manifest (uuid-named —
    a constant name would make the manifest-existence replay check treat
    every write after the first as a replay and silently drop it).
    ``mode('overwrite')`` clears previously committed files and
    manifests before publishing."""

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options)
        self.overwrite = overwrite

    def commit(self, messages) -> None:
        import os
        import uuid

        if self.overwrite:
            commits = os.path.join(self.path, "_commits")
            if os.path.isdir(commits):
                import json

                for m in sorted(os.listdir(commits)):
                    mp = os.path.join(commits, m)
                    if not m.endswith(".tmp"):
                        with open(mp) as f:
                            for name in json.load(f)["files"]:
                                old = os.path.join(self.path, name)
                                if os.path.exists(old):
                                    os.remove(old)
                    os.remove(mp)
        self._publish(messages, f"batch-{uuid.uuid4().hex}")


class _JsonlStreamWriter(_JsonlWriterBase, DataSourceStreamWriter):
    """Manifests are keyed by the checkpoint's batchId — the stable name
    a restarted query replays under, which is what makes the replay
    check exactly-once. Consequence (same contract as Spark's built-in
    file sink and its ``_spark_metadata``): one sink path belongs to ONE
    streaming query lineage; pointing a fresh-checkpoint query at a path
    with stale ``streaming-N`` manifests would misread them as replays —
    use a new path or clear ``_commits`` when retiring a checkpoint."""

    def commit(self, messages, batchId: int) -> None:
        self._publish(messages, f"streaming-{batchId}")


class JsonlAuditDataSource(DataSource):
    """``jsonl_audit`` — a line-delimited JSON sink (batch + streaming)
    with two-phase commit and manifest-gated visibility. The audit-trail
    counterpart of the reference's JSON report artifact
    (``spark_jobs/dq_checks.py:80-99``) as a real Spark sink: streaming
    restarts replaying a committed batch publish NOTHING twice
    (exactly-once by manifest check), and torn runs leave only staged
    files no reader lists. Option: ``path``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> _JsonlBatchWriter:
        return _JsonlBatchWriter(dict(self.options), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> _JsonlStreamWriter:
        return _JsonlStreamWriter(dict(self.options))


def read_jsonl_audit(spark, path: str, schema: str | None = None):
    """Manifest-gated read of a ``jsonl_audit`` dataset: only files a
    committed manifest names are visible (staged leftovers are not).
    The sink is schema-agnostic, so an empty dataset has no schema to
    infer — pass ``schema`` to get a typed empty frame in that case
    (without it, an empty path raises instead of guessing columns)."""
    import json
    import os

    commits = os.path.join(path, "_commits")
    files: list[str] = []
    if os.path.isdir(commits):
        for m in sorted(os.listdir(commits)):
            if m.endswith(".tmp"):
                continue
            with open(os.path.join(commits, m)) as f:
                files.extend(
                    os.path.join(path, name) for name in json.load(f)["files"]
                )
    if not files:
        if schema is None:
            raise ValueError(
                f"no committed jsonl_audit files under {path!r}; pass "
                "schema=... to read it as a typed empty dataset"
            )
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)


def _payload_fields(simple: str) -> list[tuple[str, str]]:
    """Top-level ``(name, type)`` pairs of a ``struct<...>`` simpleString
    (depth-aware split so nested struct/map/decimal types don't confuse
    the commas)."""
    if not (simple.startswith("struct<") and simple.endswith(">")):
        raise ValueError(f"not a struct simpleString: {simple!r}")
    inner = simple[len("struct<"):-1]
    fields, depth, cur = [], 0, ""
    for ch in inner:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            name, _, typ = cur.partition(":")
            fields.append((name, typ))
            cur = ""
        else:
            cur += ch
    if cur:
        name, _, typ = cur.partition(":")
        fields.append((name, typ))
    return fields


def _payload_names(simple: str) -> list[str]:
    return [n for n, _ in _payload_fields(simple)]


_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _check_where_literal(col: str, typ: str, val) -> str | None:
    """None when ``val`` can legally compare against a column of
    simpleString type ``typ`` in the executor-side pyarrow filter; an
    error message otherwise. Catching this at stream DEFINITION beats a
    pyarrow compute crash mid-stream on the first matching file."""
    if typ == "string":
        if not isinstance(val, str):
            return (
                f"column {col!r} is string but the literal {val!r} is "
                f"{type(val).__name__}"
            )
        return None
    if typ in _NUMERIC_TYPES or typ.startswith("decimal"):
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            return (
                f"column {col!r} is {typ} but the literal {val!r} is "
                f"{type(val).__name__}"
            )
        return None
    return (
        f"column {col!r} has type {typ}: where pushdown supports numeric "
        "and string columns only"
    )


class _ZoneFilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class _ZoneChangesStreamReader(DataSourceStreamReader):
    """Streaming reader over a versioned zone's commit log (the
    Delta-streaming idiom, format-free): offsets are VERSION NUMBERS, a
    micro-batch is the commits in (start, end], and each added parquet
    file is one input partition read executor-side with pyarrow — the
    driver plans file lists from manifests only, no data moves through
    it. Restart replays any offset range identically because manifests
    are immutable.

    Overwrite/rollback commits are not expressible as an append feed;
    ``on_overwrite`` chooses: ``'fail'`` (default — the consumer must
    resync), ``'full'`` (emit the commit's whole snapshot — downstream
    dedups/merges), or ``'skip'``. Files are read BY NAME against the
    declared (latest-manifest) schema, so a ``full`` re-emit across a
    column reorder or evolution NULL-pads/reorders instead of
    misaligning positionally."""

    def __init__(self, options: dict, payload_fields: list[tuple[str, str]]):
        import json as _json

        self.root = options["root"]
        self.payload_names = [n for n, _ in payload_fields]
        types = dict(payload_fields)
        self.on_overwrite = options.get("on_overwrite", "fail")
        if self.on_overwrite not in ("fail", "full", "skip"):
            raise ValueError(
                f"on_overwrite must be fail|full|skip, got {self.on_overwrite!r}"
            )
        # Key-erasure commits (delete_keys) are invisible to an
        # insert-only feed by construction — but a downstream MIRROR
        # built from this stream then silently RETAINS erased rows,
        # which is a GDPR-propagation surprise. 'skip' (default) keeps
        # the insert-only contract and logs one warning per skipped
        # erasure commit; 'fail' is the strict mode for consumers that
        # must propagate deletions and therefore cannot ride this feed.
        self.on_delete = options.get("on_delete", "skip")
        if self.on_delete not in ("skip", "fail"):
            raise ValueError(
                f"on_delete must be skip|fail, got {self.on_delete!r}"
            )
        self.start_after = int(options.get("starting_after_version", -1))
        self.max_versions = int(options.get("max_versions_per_trigger", 0))
        # predicate pushdown: where = JSON [[col, op, literal], ...]
        # (op: = < <= > >=). File-level: added files whose manifest
        # footer stats prove no row can match are never planned as
        # partitions (data skipping inside the stream). Row-level: the
        # surviving files are filtered executor-side with pyarrow
        # compute, so the option IS a row filter, not just a hint.
        # Numeric and string columns; comparison predicates never match
        # NULLs, and NaN is ordered ABOVE every value on >/>= (both
        # matching Spark SQL semantics, so the stream returns exactly
        # what versioned.read_version_where would — the raw pyarrow
        # comparison is IEEE and is explicitly corrected in read()).
        self.where: list = _json.loads(options.get("where", "[]"))
        for p_ in self.where:
            if (
                len(p_) != 3
                or p_[1] not in ("=", "<", "<=", ">", ">=")
                or p_[0] not in types
            ):
                raise ValueError(
                    f"zone_changes: bad where predicate {p_!r} — expected "
                    f"[payload_column, op, literal] with op in = < <= > >= "
                    f"and column among {self.payload_names}"
                )
            # literal-vs-column type check at stream DEFINITION: a
            # mismatched literal would otherwise only explode
            # executor-side in pyarrow compute on the first non-empty
            # micro-batch — long after .start() returned successfully
            err = _check_where_literal(p_[0], types[p_[0]], p_[2])
            if err is not None:
                raise ValueError(f"zone_changes: bad where predicate: {err}")
        self._cursor: int | None = None  # last end handed to partitions()

    def initialOffset(self) -> dict:
        return {"version": self.start_after}

    def latestOffset(self) -> dict:
        from realtime_data_pipeline_spark import versioned

        known = versioned.versions(self.root)
        latest = known[-1] if known else self.start_after
        # backlog pacing: cap commits per trigger so a long-idle consumer
        # catches up in bounded batches instead of one giant one. The cap
        # anchors on the previous trigger's end (the API never shows
        # latestOffset the start), so the FIRST trigger after a restart
        # is uncapped — bound it with starting_after_version if needed.
        if self.max_versions > 0 and self._cursor is not None:
            latest = min(latest, self._cursor + self.max_versions)
        if self._cursor is not None:
            # NEVER rewind: a transient versions() blip (storage hiccup)
            # or a stale listing must not move the offset log backwards —
            # that would re-deliver every commit as duplicates
            latest = max(latest, self._cursor)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        if end["version"] < start["version"]:
            raise ValueError(
                f"zone_changes: offset would rewind ({start['version']} -> "
                f"{end['version']}) — wrong zone root for this checkpoint, "
                "or starting_after_version ahead of the zone"
            )
        self._cursor = end["version"]
        return self._plan(start, end)

    def _plan(self, start: dict, end: dict):
        from realtime_data_pipeline_spark import versioned

        def manifest(v: int) -> dict:
            try:
                return versioned._read_manifest(self.root, v)
            except FileNotFoundError:
                raise ValueError(
                    f"zone_changes: manifest for version {v} was vacuumed —"
                    " this checkpoint predates the zone's retention; resync"
                    " from a full snapshot"
                ) from None

        lo = start["version"]
        # carry the previous manifest's file set across the loop: one
        # manifest read per version, not two
        prev_files: set[str] = (
            set(manifest(lo)["files"]) if lo >= 0 else set()
        )
        out = []
        for v in range(lo + 1, end["version"] + 1):
            man = manifest(v)
            if v > 0 and man["mode"] == "delete":
                # key-erasure commit (delete_keys): survivor files hold
                # ONLY rows already delivered when their source files
                # were first appended, so an insert-only stream delivers
                # nothing. Whether that is acceptable is the CONSUMER's
                # call (on_delete): a mirror built from this feed keeps
                # erased rows unless deletions propagate out-of-band.
                if self.on_delete == "fail":
                    raise ValueError(
                        f"zone_changes: version {v} is a key-erasure"
                        " commit and this stream is insert-only — erased"
                        " keys cannot be propagated through it (pass"
                        " on_delete=skip to acknowledge out-of-band"
                        " deletion handling, or resync the mirror from"
                        " a snapshot)"
                    )
                import warnings

                warnings.warn(
                    f"zone_changes: skipping erasure commit v{v} at"
                    f" {self.root} — downstream insert-only mirrors"
                    " retain erased rows; propagate deletions"
                    " out-of-band (rows_deleted="
                    f"{man.get('rows_deleted', '?')})",
                    stacklevel=2,
                )
                added = []
            elif v > 0 and man["mode"] != "append":
                if self.on_overwrite == "fail":
                    raise ValueError(
                        f"zone_changes: version {v} is mode={man['mode']!r},"
                        " not an append — pass on_overwrite=full|skip, or"
                        " resync from a snapshot"
                    )
                added = [] if self.on_overwrite == "skip" else man["files"]
            else:
                added = [p for p in man["files"] if p not in prev_files]
            prev_files = set(man["files"])
            if self.where:
                # file-level data skipping: stats-disproven files never
                # become partitions (absent stats keep the file — the
                # row filter in read() remains the correctness path)
                stats = man.get("file_stats", {})
                blooms = man.get("file_blooms", {})
                added = [
                    p
                    for p in added
                    if versioned._file_may_match(stats.get(p), self.where)
                    and versioned._bloom_may_match(
                        blooms.get(p), self.where
                    )
                ]
            out.extend(
                _ZoneFilePartition(os.path.join(self.root, p), v)
                for p in added
            )
        return out or [_ZoneFilePartition("", end["version"])]

    def read(self, partition: _ZoneFilePartition):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        names = self.payload_names
        v = partition.version
        if set(names) <= set(table.column_names):
            # fast path: select by name (reorders, drops extras), append
            # the constant version column, ship Arrow batches — no
            # per-row Python tuples. pyarrow reads Spark's parquet
            # timestamps as NANOSECOND, which Spark's Arrow ingest
            # rejects — normalize to microseconds (lossless: Spark
            # wrote µs precision)
            table = table.select(names)

            def _us(t):  # recurse: nested ns timestamps crash too
                if pa.types.is_timestamp(t) and t.unit == "ns":
                    return pa.timestamp("us", tz=t.tz)
                if pa.types.is_list(t):
                    return pa.list_(_us(t.value_type))
                if pa.types.is_struct(t):
                    return pa.struct(
                        [f.with_type(_us(f.type)) for f in t]
                    )
                if pa.types.is_map(t):
                    return pa.map_(_us(t.key_type), _us(t.item_type))
                return t

            norm = pa.schema(
                [f.with_type(_us(f.type)) for f in table.schema]
            )
            if norm != table.schema:
                table = table.cast(norm)
            if self.where:
                import pyarrow.compute as pc

                ops = {
                    "=": pc.equal, "<": pc.less, "<=": pc.less_equal,
                    ">": pc.greater, ">=": pc.greater_equal,
                }
                mask = None
                for col, op, val in self.where:
                    m = ops[op](table[col], val)
                    # Spark SQL orders NaN ABOVE every value, pyarrow
                    # compares IEEE (NaN matches nothing) — OR the NaN
                    # rows back into upper-bound matches so the stream
                    # filter returns exactly what read_version_where
                    # would. (<, <=, = agree between the regimes: NaN
                    # matches neither way.)
                    if op in (">", ">=") and pa.types.is_floating(
                        table[col].type
                    ):
                        m = pc.or_kleene(m, pc.is_nan(table[col]))
                    m = pc.fill_null(m, False)
                    mask = m if mask is None else pc.and_(mask, m)
                table = table.filter(mask)
            table = table.append_column(
                "_commit_version", pa.array([v] * len(table), pa.int64())
            )
            yield from table.to_batches()
            return
        # evolution path (on_overwrite=full across a schema change): a
        # column the declared schema expects is absent — NULL-pad by name
        def _row_matches(row: tuple) -> bool:
            by_name = dict(zip(names, row))
            for col, op, val in self.where:
                x = by_name.get(col)
                if x is None:
                    return False  # comparisons never match NULL
                if isinstance(x, float) and x != x:
                    # NaN: Spark orders it above every value
                    ok = op in (">", ">=")
                else:
                    ok = {
                        "=": x == val, "<": x < val, "<=": x <= val,
                        ">": x > val, ">=": x >= val,
                    }[op]
                if not ok:
                    return False
            return True

        cols = [
            table[n].to_pylist() if n in table.column_names
            else [None] * len(table)
            for n in names
        ]
        for row in zip(*cols):
            if not self.where or _row_matches(row):
                yield (*row, v)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class ZoneChangesDataSource(DataSource):
    """``zone_changes`` — stream a versioned zone's commits as
    micro-batches. Options: ``root`` (required), ``on_overwrite``
    (fail|full|skip), ``on_delete`` (skip|fail — key-erasure commits
    deliver nothing to an insert-only feed; ``skip``, the default, logs
    a per-commit warning that downstream mirrors retain erased rows,
    ``fail`` refuses the stream for consumers that must propagate
    deletions), ``starting_after_version``,
    ``max_versions_per_trigger``, ``where`` (JSON
    ``[[col, op, literal], ...]`` with op in ``= < <= > >=`` — a real
    row filter evaluated executor-side, with manifest footer-stats file
    skipping underneath so provably-dead files are never even planned;
    numeric/string columns, and the literal's type is validated against
    the manifest schema at stream DEFINITION so a mismatch fails at
    ``.load()``, not executor-side mid-stream. NaN rows match
    ``>``/``>=`` — Spark-SQL ordering, not pyarrow's IEEE default — so
    the filtered stream equals ``read_version_where`` exactly on
    NaN-bearing float columns too). Payload schema comes from the
    zone's latest manifest plus ``_commit_version bigint``.

    CAVEAT — ``max_versions_per_trigger`` paces a catch-up backlog from
    the SECOND trigger of a run onward: the cap anchors on an in-memory
    cursor that does not survive restart, so the FIRST trigger after a
    (re)start ingests everything between the checkpoint offset and the
    zone head uncapped. For bounded catch-up after a restart, set
    ``starting_after_version`` near the head (or resync from a snapshot)
    rather than relying on the cap alone."""

    @classmethod
    def name(cls) -> str:
        return "zone_changes"

    def schema(self) -> str:
        from realtime_data_pipeline_spark import versioned

        root = self.options["root"]
        known = versioned.versions(root)
        if not known:
            raise ValueError(f"zone_changes: no committed versions in {root!r}")
        simple = versioned._read_manifest(root, known[-1]).get("schema")
        if simple is None:
            raise ValueError(
                f"zone_changes: latest manifest of {root!r} records no schema"
            )
        # schema() runs in a session-less worker process: no JVM, so no
        # StructType.fromDDL here — splice the extra column into the
        # manifest's simpleString ("struct<k:bigint,...>"), a form
        # Spark's DDL parser accepts once it is back on the driver
        self._payload = _payload_fields(simple)
        return simple[:-1] + ",_commit_version:bigint>"

    def streamReader(self, schema):
        # schema() always runs first; fall back for direct construction
        payload = getattr(self, "_payload", None) or _payload_fields(
            self.schema()[: -len(",_commit_version:bigint>")] + ">"
        )
        return _ZoneChangesStreamReader(dict(self.options), payload)


def register(spark) -> None:
    """Idempotent registration of every custom source in this module."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlAuditDataSource)
    spark.dataSource.register(PagedJsonlDataSource)
    spark.dataSource.register(ZoneChangesDataSource)
