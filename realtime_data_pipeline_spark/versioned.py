"""Versioned parquet zones: manifest-based snapshot isolation, time
travel, rollback, and vacuum — the table-format core (Delta/Iceberg's
transaction log idea) in its minimal format-free shape.

Why it exists: plain ``overwrite`` of a parquet root is NOT safe under
concurrent readers (the directory listing mutates mid-query), silver
rebuilds destroy yesterday's answer, and there is no way to ask "what
did this table say before the bad backfill?". The reference's pipeline
(overwrite-only zones, ``spark_jobs/batch_etl.py:76-81``) has all three
problems. A real table format fixes them with a transaction log; this
module implements exactly that mechanism and nothing else:

* data files are IMMUTABLE: every commit writes its files under a fresh
  ``data/c-<uuid>/`` directory — nothing ever rewrites or deletes a
  file another snapshot references;
* a snapshot is a MANIFEST: ``_manifests/v<N>.json`` lists every live
  file (relative paths). Readers resolve a manifest once and read that
  exact file list — a concurrent commit cannot change a running query's
  inputs (snapshot isolation by construction);
* commits are ATOMIC and OPTIMISTICALLY CONCURRENT: the manifest is
  created with ``O_EXCL`` at version ``latest+1``; a racing writer
  loses the create, re-reads the new latest, and retries against it —
  single-writer serialization without locks;
* rollback is a NEW COMMIT that re-publishes an old manifest's file
  list (non-destructive — the bad version stays inspectable);
* ``vacuum`` deletes manifests beyond a retention window and any data
  file no kept manifest references — the only deletion in the design,
  and it never touches a kept snapshot's files.

Scale shape: commit cost is O(files in the commit) plus one JSON write
— never O(rows) and never a rewrite of existing data; reads are a file
list handed straight to the parquet scan (Catalyst pushdown/pruning
apply per file as usual). At 100 TB the manifest for a wide table is
megabytes of JSON; the real formats shard it (Iceberg's manifest
lists) — the contract here is the same, the encoding deliberately
simpler. On a cluster the zone root must be shared storage whose rename
is atomic per object (the same contract every checkpoint relies on).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """A conditional commit (``expected_latest=``) lost: another writer
    advanced the zone after this writer read its base snapshot."""


_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFESTS, f"v{version:010d}.json")


def versions(root: str) -> list[int]:
    """Committed version numbers, ascending; [] for a fresh root."""
    mdir = os.path.join(root, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _typed_empty(spark: SparkSession, manifest: dict) -> DataFrame:
    """Empty frame typed from a manifest's RECORDED schema — inferring
    from surviving commit dirs could pick a different version's schema
    (or crash on a fresh zone)."""
    from pyspark.sql.types import StructType

    ddl = manifest.get("schema")
    if ddl is None:
        raise ValueError(
            f"version {manifest.get('version')} is empty and records no "
            "schema — cannot type it"
        )
    return spark.createDataFrame([], StructType.fromDDL(ddl))


def _atomic_claim(target: str, body: str) -> bool:
    """Atomically create ``target`` WITH its full content, or not at all:
    write a sibling temp file, then hard-link it into place — link fails
    if the target exists (the claim), and the target is never observable
    empty or partial (a bare O_EXCL-create-then-write would expose both
    windows: readers json-loading a 0-byte manifest, and a crash between
    create and write wedging the version number forever)."""
    tmp = f"{target}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(body)
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _norm_stat(v):
    """Normalize a parquet-footer statistic (or a query literal) to a
    JSON-safe, totally-ordered-within-its-type value: numbers stay
    numbers (NaN/inf → unusable), bytes decode, date/timestamp become
    ISO strings (lexicographic order == chronological order). None ⇒
    the value can't participate in pruning."""
    import datetime

    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return None if (v != v or v in (float("inf"), float("-inf"))) else v
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return None


def _stat_kind(raw) -> str:
    """Column-kind marker stored beside each [min, max] pair so the
    pruner knows which comparison regime the column's Spark filter will
    use: ``f`` float (NaN orders ABOVE max in Spark but is absent from
    parquet footer min/max), ``t``/``d`` timestamp/date (recorded as ISO
    strings; user literals may spell the same instant differently),
    ``n`` integer, ``s`` string/binary."""
    import datetime

    if isinstance(raw, float):
        return "f"
    if isinstance(raw, datetime.datetime):
        return "t"
    if isinstance(raw, datetime.date):
        return "d"
    if isinstance(raw, bool) or isinstance(raw, int):
        return "n"
    return "s"


def _ts_parse(s):
    """ISO-ish string → naive-UTC datetime (accepts 'T' or ' '
    separators and truncated time forms, i.e. both isoformat() output
    and the literals users actually type); None when not
    chronologically parseable. Footer stats for Spark-written
    timestamps are tz-aware (+00:00, isAdjustedToUTC) while user
    literals are naive — the session pins UTC, so both collapse to
    naive UTC for comparison."""
    import datetime

    if not isinstance(s, str):
        return None
    try:
        dt = datetime.datetime.fromisoformat(s)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def _collect_file_stats(root: str, rel_paths: list[str]) -> dict:
    """Per-file min/max of top-level columns, read from parquet FOOTERS
    (no data pages touched) — one driver-side metadata read per added
    file at commit time, the same O(files-in-commit) cost class as the
    manifest write itself. Columns whose stats are absent/unusable in
    ANY row group are dropped for that file (absence must never prune).
    Each entry is ``[min, max, kind]`` — the kind marker (see
    :func:`_stat_kind`) lets :func:`_file_may_match` apply the right
    comparison regime (floats: NaN-aware; timestamps: chronological)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_paths:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        mins: dict = {}
        maxs: dict = {}
        kinds: dict = {}
        dead: set[str] = set()
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for i in range(rgm.num_columns):
                col = rgm.column(i)
                name = col.path_in_schema
                if "." in name or name in dead:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    dead.add(name)
                    continue
                lo, hi = _norm_stat(st.min), _norm_stat(st.max)
                if lo is None or hi is None:
                    dead.add(name)
                    continue
                if name in mins:
                    mins[name] = min(mins[name], lo)
                    maxs[name] = max(maxs[name], hi)
                else:
                    mins[name], maxs[name] = lo, hi
                    kinds[name] = _stat_kind(st.min)
        out[rel] = {
            n: [mins[n], maxs[n], kinds[n]] for n in mins if n not in dead
        }
    return out


def _bloom_positions(data: bytes, m: int, k: int) -> list[int]:
    """k bit positions for a value's canonical bytes via double hashing
    (Kirsch–Mitzenmacher: ``h1 + i*h2``) over one blake2b digest — pure
    Python/stdlib so the COMMIT-side bitmap builder (executor pandas
    batches) and the READ-side probe (driver, manifest only) are the
    same function, with no dependence on Spark's hash implementations
    staying stable across versions. ``h2`` is forced odd so for
    power-of-two ``m`` the stride cycles every residue."""
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_encode(kind: str, v) -> bytes:
    """Canonical type-tagged bytes for a bloom member/probe. The tag
    keeps an int's bytes from ever colliding with a string's; the kind
    is taken from the COLUMN (recorded in the manifest entry), so an
    equality literal of the other Python type is simply not probed
    (see :func:`_bloom_may_match`) rather than mis-encoded."""
    if kind == "n":
        return b"i:%d" % int(v)
    return b"s:" + str(v).encode("utf-8")


def _bloom_kind(dtype) -> str | None:
    """Spark column type → bloom kind marker: integral → ``n``, string
    → ``s``, anything else → None (unsupported — equality point-lookups
    on floats/timestamps go through the min/max stats path instead)."""
    from pyspark.sql import types as T

    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return "n"
    if isinstance(dtype, T.StringType):
        return "s"
    return None


def _collect_file_blooms(
    spark: SparkSession,
    commit_abs_dir: str,
    schema,
    bloom_cols: list[str],
    m: int,
    k: int,
) -> dict:
    """Per-file bloom bitmaps for ``bloom_cols``, computed DISTRIBUTED:
    a column-pruned re-read of only the commit's just-written files
    (``_metadata.file_path`` tags rows with their file), partial
    bitmaps OR-accumulated per input partition in Arrow-batched pandas
    (``mapInPandas`` — no shuffle: partition-local partials, the final
    OR-merge is driver-side over ``O(partitions × cols)`` 1 KiB rows).
    Returns ``{file_basename: {col: bitmap bytes}}``.

    This is the complement to :func:`_collect_file_stats`: min/max
    footer stats prune RANGE predicates but are useless for equality
    point-lookups on a high-cardinality column that is not sorted into
    the file layout (every file's [min, max] spans the whole domain);
    a 1 KiB-per-file bloom answers ``col = v`` with ~2% false
    positives at 1k distinct values/file, so a 100 TB snapshot's point
    lookup reads only the files that can hold the key. Cost is one
    extra scan of the indexed columns at commit time — O(commit), never
    O(table)."""
    import pandas as pd

    from pyspark.sql import functions as F

    kinds = {}
    for c in bloom_cols:
        field = {f.name: f for f in schema.fields}.get(c)
        if field is None:
            raise ValueError(
                f"bloom_cols: {c!r} is not a column of the commit "
                f"(columns: {[f.name for f in schema.fields]})"
            )
        kind = _bloom_kind(field.dataType)
        if kind is None:
            raise ValueError(
                f"bloom_cols: {c!r} has type {field.dataType.simpleString()}"
                " — bloom indexing supports integral and string columns"
                " (point-lookup keys); use footer stats for the rest"
            )
        kinds[c] = kind

    cols = list(bloom_cols)
    nbytes = m // 8
    tags = {c: (b"i:" if kinds[c] == "n" else b"s:") for c in cols}

    def _partial(batches):
        acc: dict = {}
        for pdf in batches:
            files = pdf["__bloom_file"]
            for c in cols:
                tag = tags[c]
                for f, v in zip(files, pdf[c]):
                    if v is None or (isinstance(v, float) and v != v):
                        continue
                    ba = acc.get((f, c))
                    if ba is None:
                        ba = acc[(f, c)] = bytearray(nbytes)
                    # v is the SPARK-side string cast of the value —
                    # `b"i:" + digits` is byte-identical to
                    # _bloom_encode("n", int_literal)'s `b"i:%d"`, and
                    # the probe side encodes through _bloom_encode, so
                    # member and probe bytes agree exactly
                    for pos in _bloom_positions(
                        tag + v.encode("utf-8"), m, k
                    ):
                        ba[pos >> 3] |= 1 << (pos & 7)
        if acc:
            yield pd.DataFrame(
                {
                    "file": [f for f, _ in acc],
                    "col": [c for _, c in acc],
                    "bits": [bytes(b) for b in acc.values()],
                }
            )

    # every bloom column travels to pandas as a STRING: an integral
    # Arrow column that contains a NULL lands in pandas as float64, and
    # float64 rounds int values above 2^53 before the encode sets bits —
    # a later probe of the exact literal then finds its bits unset and
    # the file is WRONGLY pruned (silent missing rows; the 'no false
    # negatives' contract breaks). Spark's bigint→string cast is exact
    # for the full int64 range and NULLs stay None in object arrays, so
    # the member bytes match the probe's %d formatting digit-for-digit.
    partials = (
        spark.read.parquet(commit_abs_dir)
        .select(
            *[F.col(c).cast("string").alias(c) for c in cols],
            F.col("_metadata.file_path").alias("__bloom_file"),
        )
        .mapInPandas(_partial, "file string, col string, bits binary")
        .collect()
    )
    out: dict = {}
    for r in partials:
        base = os.path.basename(r["file"])
        ent = out.setdefault(base, {})
        prev = ent.get(r["col"])
        ent[r["col"]] = (
            r["bits"]
            if prev is None
            else bytes(a | b for a, b in zip(prev, r["bits"]))
        )
    return out


def commit_version(
    df: DataFrame,
    root: str,
    mode: str = "append",
    max_retries: int = 10,
    batch_tag: str | None = None,
    expected_latest: int | None = None,
    collect_stats: bool = True,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 8192,
    bloom_hashes: int = 6,
    zorder_cols: list[str] | None = None,
    zorder_files: int = 16,
    zorder_bits: int = 8,
) -> dict:
    """Write ``df`` as a new snapshot of the zone.

    ``mode='append'`` publishes previous-latest files + this commit's;
    ``'overwrite'`` publishes only this commit's (old snapshots stay
    readable until vacuumed). ``batch_tag`` makes the commit IDEMPOTENT
    under replay: a marker in ``_commits_by_tag/`` is created atomically
    with publication, and a second commit carrying the same tag is a
    no-op (the streaming-restart contract — see
    :func:`versioned_batch_writer`). ``expected_latest`` makes the
    commit CONDITIONAL: publish only if the zone's latest version still
    equals it (compare-and-swap) — the read-modify-write guard for
    writers whose output depends on what they read (e.g.
    :func:`compact_snapshot`), where the plain retry loop would
    serialize version numbers but silently publish on top of a state it
    never saw; raises ``ConcurrentCommitError`` on conflict. Returns
    {version, files_added, rows} (or {skipped_replay: True, ...} for a
    deduplicated replay).

    ``bloom_cols`` additionally records a per-file BLOOM bitmap for the
    named integral/string columns (``bloom_bits`` bits, ``bloom_hashes``
    probes — defaults: 1 KiB/file/column, ~2% FP at 1k distinct
    values/file), built distributed from the just-written files (see
    :func:`_collect_file_blooms`) and carried forward on append exactly
    like ``file_stats``. ``read_version_where`` / ``prune_report`` /
    the ``zone_changes`` stream probe it on ``=`` predicates — the
    point-lookup complement to min/max range skipping.

    ``zorder_cols`` Z-order-clusters THIS COMMIT's files before the
    write (``medallion.zorder_frame``: Morton code over quantile-
    bucketed ranks, ``zorder_files`` output files, ``zorder_bits`` bits
    per column), so each file covers a small hyper-cube of the clustered
    value space and the manifest's per-file min/max ``file_stats`` —
    collected from exactly these files — let ``read_version_where`` /
    ``prune_report`` skip on ANY clustered column through the manifest
    alone (no footer reads). The two features compose per commit:
    earlier commits' files keep their own stats/layout, so a daily
    append pipeline gets clustering commit-by-commit without a table
    rewrite; run :func:`compact_snapshot` through a z-ordered re-commit
    to recluster history. Requires ``collect_stats`` (the clustering
    is pointless without the stats that exploit it — raises)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if zorder_cols:
        if not collect_stats:
            raise ValueError(
                "zorder_cols requires collect_stats=True — clustered "
                "files prune through the manifest's per-file stats"
            )
        from realtime_data_pipeline_spark.medallion import zorder_frame

        df = zorder_frame(df, zorder_cols, zorder_files, zorder_bits)
    if batch_tag is not None:
        marker = os.path.join(root, "_commits_by_tag", batch_tag)
        if os.path.exists(marker):
            with open(marker) as f:
                return {"skipped_replay": True, **json.load(f)}
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    commit_dir = f"c-{uuid.uuid4().hex}"
    os.makedirs(os.path.join(root, _MANIFESTS), exist_ok=True)
    cur_schema = df.schema.simpleString()

    def _check_append_schema(latest: int) -> None:
        # append-time schema guard: a snapshot whose files disagree on
        # columns reads through ONE sampled footer and silently drops
        # the others' columns — refuse the mixed append instead.
        # (Overwrite starts a fresh file list, so evolution happens
        # naturally there.) Checked before the data write (fail fast)
        # AND inside every retry (a lost race may have put a different
        # schema at latest).
        prev = _read_manifest(root, latest).get("schema")
        if prev is not None and prev != cur_schema:
            raise ValueError(
                "append schema mismatch vs latest snapshot:\n"
                f"  snapshot: {prev}\n  commit:   {cur_schema}\n"
                "overwrite to evolve the schema, or align the columns"
            )

    known_now = versions(root)
    if mode == "append" and known_now:
        _check_append_schema(known_now[-1])
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, _DATA, commit_dir))
    rows = int(obs.get["rows"])
    added = sorted(
        os.path.join(_DATA, commit_dir, f)
        for f in os.listdir(os.path.join(root, _DATA, commit_dir))
        if f.endswith(".parquet")
    )
    added_stats = (
        _collect_file_stats(root, added) if collect_stats else {}
    )
    added_blooms: dict = {}
    if bloom_cols:
        if bloom_bits % 8 or bloom_bits <= 0 or bloom_hashes <= 0:
            raise ValueError(
                "bloom_bits must be a positive multiple of 8 and "
                f"bloom_hashes positive, got {bloom_bits}/{bloom_hashes}"
            )
        by_base = _collect_file_blooms(
            df.sparkSession,
            os.path.join(root, _DATA, commit_dir),
            df.schema,
            list(bloom_cols),
            bloom_bits,
            bloom_hashes,
        )
        import base64

        for rel in added:
            ent = by_base.get(os.path.basename(rel))
            if ent:  # a file of all-NULL key values has nothing to index
                added_blooms[rel] = {
                    c: {
                        "m": bloom_bits,
                        "k": bloom_hashes,
                        "kind": _bloom_kind(
                            df.schema[c].dataType
                        ),
                        "b64": base64.b64encode(bits).decode("ascii"),
                    }
                    for c, bits in ent.items()
                }

    for _ in range(max_retries):
        known = versions(root)
        if expected_latest is not None and (
            not known or known[-1] != expected_latest
        ):
            raise ConcurrentCommitError(
                f"conditional commit failed: zone latest is "
                f"{known[-1] if known else None}, expected "
                f"{expected_latest} — re-read and retry"
            )
        new_version = (known[-1] + 1) if known else 0
        files = list(added)
        file_stats = dict(added_stats)
        file_blooms = dict(added_blooms)
        if mode == "append" and known:
            _check_append_schema(known[-1])
            prev_man = _read_manifest(root, known[-1])
            files = prev_man["files"] + files
            # carry the carried-over files' stats forward so every
            # manifest is self-contained (like its file list)
            prev_stats = prev_man.get("file_stats", {})
            file_stats.update(
                {
                    f: prev_stats[f]
                    for f in prev_man["files"]
                    if f in prev_stats
                }
            )
            prev_blooms = prev_man.get("file_blooms", {})
            file_blooms.update(
                {
                    f: prev_blooms[f]
                    for f in prev_man["files"]
                    if f in prev_blooms
                }
            )
        body_dict = {
            "version": new_version,
            "mode": mode,
            "files": files,
            "rows_added": rows,
            "schema": cur_schema,
            "file_stats": file_stats,
        }
        if file_blooms:
            body_dict["file_blooms"] = file_blooms
        body = json.dumps(body_dict)
        # exactly one writer claims v<N> — the loser re-reads the NEW
        # latest and retries on top of it
        if not _atomic_claim(_manifest_path(root, new_version), body):
            continue
        out = {"version": new_version, "files_added": len(added), "rows": rows}
        if batch_tag is not None:
            tag_dir = os.path.join(root, "_commits_by_tag")
            os.makedirs(tag_dir, exist_ok=True)
            tmp = os.path.join(tag_dir, f".{batch_tag}.tmp")
            with open(tmp, "w") as f:
                json.dump(out, f)
            os.replace(tmp, os.path.join(tag_dir, batch_tag))
        return out
    raise RuntimeError(
        f"commit lost the optimistic-concurrency race {max_retries} times"
    )


def versioned_batch_writer(
    root: str, mode: str = "append", bloom_cols: list[str] | None = None
):
    """``foreachBatch`` hook committing every micro-batch as one zone
    version, exactly-once under streaming replay: the batch id is the
    commit's ``batch_tag``, so a restarted query re-delivering the last
    batch finds its marker and publishes nothing twice. Each trigger
    becomes one inspectable snapshot — time travel per micro-batch, and
    rollback of a poison batch is :func:`rollback` to its predecessor.

    Crash window honesty: the marker lands AFTER the manifest, so a
    crash exactly between the two replays the batch into a second
    version holding the same rows. With ``mode='overwrite'`` the latest
    snapshot is still correct (old one vacuumable); with ``'append'``
    the replayed version double-counts and must be rolled back — prefer
    overwrite-shaped (idempotent) batches for append-critical zones, or
    dedup downstream, the same contract as every non-transactional
    foreachBatch sink."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        commit_version(
            batch_df,
            root,
            mode=mode,
            batch_tag=f"stream-{batch_id}",
            bloom_cols=bloom_cols,
        )

    return _write


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The zone as of ``version`` (default: latest). The file list is
    resolved HERE, once — a commit that lands after this call cannot
    change what the returned DataFrame reads."""
    known = versions(root)
    if not known:
        raise ValueError(f"no committed versions under {root!r}")
    v = known[-1] if version is None else version
    if v not in known:
        raise ValueError(f"version {v} not in {known}")
    manifest = _read_manifest(root, v)
    files = manifest["files"]
    if not files:
        # empty snapshot (e.g. an empty micro-batch commit)
        return _typed_empty(spark, manifest)
    return spark.read.parquet(*[os.path.join(root, p) for p in files])


_PRUNE_OPS = ("=", "<", "<=", ">", ">=")


def _file_may_match(stats: dict | None, preds: list[tuple]) -> bool:
    """False only when the file's recorded [min, max] PROVES no row can
    satisfy every predicate — absent stats, unknown columns, and
    incomparable literals all keep the file (skipping is an
    optimization, never a correctness decision).

    Two comparison-regime traps are handled via the stats' kind marker:

    * FLOAT columns: parquet footer min/max exclude NaN, but Spark SQL
      orders NaN ABOVE every value — a file whose only rows matching
      ``col > v`` are NaN would look dead by its max. Upper-bound ops
      (``>``/``>=``) therefore never prune float files; ``=``/``<``/
      ``<=`` stay sound because NaN rows cannot match them.
    * TIMESTAMP/DATE columns: stats are isoformat strings ('T'
      separator); a user literal may spell the same instant with a
      space or truncated seconds, and lexicographic order would then
      disagree with the chronological order Spark's filter uses. Both
      sides are parsed to datetimes before comparing; an unparseable
      literal keeps the file.
    * legacy 2-element entries (no kind marker): float bounds are
      recognizable from JSON and treated as ``f``; string bounds that
      parse as datetimes prune only when the proof holds under BOTH
      lexicographic and chronological order (the column could be either
      a real string or a recorded timestamp)."""
    if not stats:
        return True
    for col, op, val in preds:
        rng = stats.get(col)
        v = _norm_stat(val)
        if not rng or v is None:
            continue
        lo, hi = rng[0], rng[1]
        kind = rng[2] if len(rng) > 2 else None
        if kind is None and (isinstance(lo, float) or isinstance(hi, float)):
            kind = "f"
        if kind == "f" and op in (">", ">="):
            continue
        # every interpretation in this list must prove the file dead
        if kind in ("t", "d"):
            chron = tuple(_ts_parse(x) for x in (lo, hi, v))
            if any(x is None for x in chron):
                continue
            interps = [chron]
        else:
            interps = [(lo, hi, v)]
            if (
                kind is None
                and isinstance(v, str)
                and isinstance(lo, str)
                and isinstance(hi, str)
            ):
                chron = tuple(_ts_parse(x) for x in (lo, hi, v))
                if all(x is not None for x in chron):
                    interps.append(chron)

        def _dead(lo_i, hi_i, v_i) -> bool:
            if op == "=":
                return not (lo_i <= v_i <= hi_i)
            if op == "<":
                return not (lo_i < v_i)
            if op == "<=":
                return not (lo_i <= v_i)
            if op == ">":
                return not (hi_i > v_i)
            return not (hi_i >= v_i)

        try:
            if all(_dead(*t) for t in interps):
                return False
        except TypeError:
            continue
    return True


def _bloom_may_match(blooms: dict | None, preds: list[tuple]) -> bool:
    """False only when a file's recorded bloom bitmap PROVES an
    equality predicate's key is absent (a bloom has no false
    negatives). Non-equality ops, columns without a bloom, and
    literals whose Python type does not match the recorded column
    kind (int↔string — Spark would cast, the bitmap was built from the
    column's own values) all keep the file: like the min/max path,
    skipping is an optimization, never a correctness decision."""
    if not blooms:
        return True
    import base64

    for col, op, val in preds:
        if op != "=":
            continue
        ent = blooms.get(col)
        if not ent:
            continue
        if isinstance(val, bool):
            continue
        kind = ent.get("kind")
        if kind == "n" and not isinstance(val, int):
            continue
        if kind == "s" and not isinstance(val, str):
            continue
        if kind not in ("n", "s"):
            continue
        bits = base64.b64decode(ent["b64"])
        m, k = int(ent["m"]), int(ent["k"])
        if len(bits) * 8 != m:
            continue  # torn/foreign entry proves nothing
        for pos in _bloom_positions(_bloom_encode(kind, val), m, k):
            if not (bits[pos >> 3] >> (pos & 7)) & 1:
                return False
    return True


def _check_preds(predicates: list[tuple]) -> None:
    for p in predicates:
        if len(p) != 3 or p[1] not in _PRUNE_OPS:
            raise ValueError(
                f"predicate must be (col, op, value) with op in "
                f"{_PRUNE_OPS}, got {p!r}"
            )


def prune_report(
    root: str, predicates: list[tuple], version: int | None = None
) -> dict:
    """How many of a snapshot's files the recorded footer stats prove
    OUT for ``predicates`` — the observability half of
    :func:`read_version_where` (driver-side, reads one manifest, no
    Spark)."""
    _check_preds(predicates)
    known = versions(root)
    if not known:
        raise ValueError(f"no committed versions under {root!r}")
    v = known[-1] if version is None else version
    if v not in known:
        raise ValueError(f"version {v} not in {known}")
    man = _read_manifest(root, v)
    stats = man.get("file_stats", {})
    blooms = man.get("file_blooms", {})
    kept = [
        f
        for f in man["files"]
        if _file_may_match(stats.get(f), predicates)
        and _bloom_may_match(blooms.get(f), predicates)
    ]
    return {
        "version": v,
        "total_files": len(man["files"]),
        "kept_files": len(kept),
        "skipped_files": len(man["files"]) - len(kept),
    }


def read_version_where(
    spark: SparkSession,
    root: str,
    predicates: list[tuple],
    version: int | None = None,
) -> DataFrame:
    """Stats-pruned snapshot read — Delta-style data skipping on the
    manifest's per-file footer stats. ``predicates`` is a list of
    ``(column, op, literal)`` with op in ``= < <= > >=``; files whose
    recorded [min, max] prove no row can match are dropped from the
    scan BEFORE Spark sees them (on a range-sorted or z-ordered zone a
    narrow predicate reads a handful of files out of a 100 TB snapshot
    — file-level pruning on top of the row-group pruning parquet
    already does). The predicates are ALSO applied as Spark filters, so
    the result equals ``read_version(...).filter(...)`` exactly:
    pruning can only skip provably-dead files, never change the answer
    (date/timestamp literals are parsed and compared chronologically —
    a space-separated or truncated literal prunes exactly like the
    isoformat the stats were recorded in; float columns never prune on
    ``>``/``>=`` because Spark orders NaN above every recorded max).
    Comparison predicates never match NULL rows on either path, so
    null-heavy files prune soundly too. Files committed with
    ``bloom_cols=`` are additionally probed on ``=`` predicates via
    their recorded bloom bitmaps — the high-cardinality point-lookup
    case where every file's [min, max] spans the whole domain and range
    stats prune nothing."""
    from pyspark.sql import functions as F

    _check_preds(predicates)
    known = versions(root)
    if not known:
        raise ValueError(f"no committed versions under {root!r}")
    v = known[-1] if version is None else version
    if v not in known:
        raise ValueError(f"version {v} not in {known}")
    man = _read_manifest(root, v)
    stats = man.get("file_stats", {})
    blooms = man.get("file_blooms", {})
    kept = [
        f
        for f in man["files"]
        if _file_may_match(stats.get(f), predicates)
        and _bloom_may_match(blooms.get(f), predicates)
    ]
    if not kept:
        df = _typed_empty(spark, man)
    else:
        df = spark.read.parquet(*[os.path.join(root, p) for p in kept])
    ops_map = {
        "=": lambda c, x: F.col(c) == F.lit(x),
        "<": lambda c, x: F.col(c) < F.lit(x),
        "<=": lambda c, x: F.col(c) <= F.lit(x),
        ">": lambda c, x: F.col(c) > F.lit(x),
        ">=": lambda c, x: F.col(c) >= F.lit(x),
    }
    for col, op, val in predicates:
        df = df.filter(ops_map[op](col, val))
    return df


def changes(
    spark: SparkSession, root: str, version: int, minimal: bool = False
) -> DataFrame:
    """Change data feed for one commit: the rows a downstream consumer
    must apply to move from ``version - 1`` to ``version``, tagged
    ``_change_type`` (insert | delete) and ``_commit_version``.

    Resolution is MANIFEST-level first: an append commit's change set is
    exactly its added files — read directly, zero shuffle, zero diff,
    regardless of zone size (this is the incremental-consumer path: a
    daily ETL tailing a 100 TB zone reads only the day's files). An
    overwrite commit logically deletes the old snapshot and inserts the
    new one, and that full delete+insert IS the default answer;
    ``minimal=True`` instead computes the row-level delta between the
    two snapshots (``exceptAll`` both ways — two shuffles of both
    snapshots, opt-in because at scale you usually want the cheap
    file-level truth or should be appending in the first place).

    Files AND manifests of superseded snapshots survive until ``vacuum``
    — a CDF read whose predecessor manifest was vacuumed raises (the
    delta vs a destroyed snapshot is unknowable; treating the oldest
    SURVIVING commit as genesis would silently re-deliver the whole
    zone as inserts). A schema-evolving overwrite yields the full
    delete+insert with the old rows NULL-padded to the new schema —
    ``minimal`` is ignored there (every row differs across a schema
    change anyway)."""
    from pyspark.sql import functions as F

    known = versions(root)
    if version not in known:
        raise ValueError(f"version {version} not in {known}")
    man = _read_manifest(root, version)

    def _read(paths: list[str], manifest: dict) -> DataFrame:
        if not paths:
            return _typed_empty(spark, manifest)
        return spark.read.parquet(*[os.path.join(root, p) for p in paths])

    def _tag(df: DataFrame, kind: str) -> DataFrame:
        return df.withColumn("_change_type", F.lit(kind)).withColumn(
            "_commit_version", F.lit(version)
        )

    prev_man = None
    if version > 0:
        try:
            prev_man = _read_manifest(root, version - 1)
        except FileNotFoundError:
            raise ValueError(
                f"cannot compute changes for version {version}: its "
                f"predecessor {version - 1} was vacuumed — resync from a "
                "full snapshot instead"
            ) from None

    if prev_man is None or man["mode"] == "append":
        prev_files = set(prev_man["files"]) if prev_man else set()
        added = [p for p in man["files"] if p not in prev_files]
        return _tag(_read(added, man), "insert")

    if man["mode"] == "delete":
        # key-erasure commit (delete_keys): carried files cancel at the
        # MANIFEST level — the delta is (rewritten-away files) minus
        # (their survivor files), deletes only, read over O(affected)
        # rows no matter the zone size. Always minimal by construction.
        cur_files = set(man["files"])
        prev_files = set(prev_man["files"])
        affected = [p for p in prev_man["files"] if p not in cur_files]
        added = [p for p in man["files"] if p not in prev_files]
        before = _read(affected, prev_man)
        after = _read(added, man)
        return _tag(before.exceptAll(after), "delete")

    # overwrite (or rollback) commit
    prev = _read(prev_man["files"], prev_man)
    cur = _read(man["files"], man)
    if set(cur.columns) != set(prev.columns):
        # schema evolution: row-level diff is meaningless (every row
        # "changed"); emit the full logical swap, old rows NULL-padded
        return _tag(cur, "insert").unionByName(
            _tag(prev, "delete"), allowMissingColumns=True
        )
    if not minimal:
        return _tag(cur, "insert").unionByName(_tag(prev, "delete"))
    return _tag(cur.exceptAll(prev), "insert").unionByName(
        _tag(prev.exceptAll(cur), "delete")
    )


def diff_versions(
    spark: SparkSession, root: str, v_from: int, v_to: int
) -> DataFrame:
    """Row-level MULTISET diff between two snapshots of the zone, any
    span apart: the rows to apply to move ``v_from``'s snapshot to
    ``v_to``'s, tagged ``_change_type`` (insert | delete). The
    audit/reconciliation complement to :func:`changes` /
    :func:`changes_since` — those replay every commit in the range
    (delete+insert pairs for each intermediate overwrite), this answers
    "what is the NET difference between Monday and Friday" in one step.

    Scale shape — shared files cancel BEFORE any read: a file present in
    both manifests contributes identical rows to both sides of the
    multiset difference, so the diff only ever reads and shuffles the
    files unique to each side. On an append-only history that is exactly
    the appended files (and the delete side is empty, so the insert side
    returns with ZERO shuffle — no ``exceptAll`` is even planned); after
    a pure re-layout compaction both sides still cancel row-for-row and
    the result is empty without scanning untouched data. Only rewritten
    files pay the two ``exceptAll`` shuffles, and only over their own
    rows — never O(zone).

    A schema change between the versions makes row-level diffing
    meaningless (every row differs); like :func:`changes`, the result is
    the full logical swap — ``v_to`` rows as inserts, ``v_from`` rows as
    deletes, NULL-padded to the union schema. Raises if either manifest
    was vacuumed (the diff vs a destroyed snapshot is unknowable)."""
    from pyspark.sql import functions as F

    known = versions(root)
    for v in (v_from, v_to):
        if v not in known:
            raise ValueError(f"version {v} not in {known}")
    man_from = _read_manifest(root, v_from)
    man_to = _read_manifest(root, v_to)

    def _read(paths: list[str], manifest: dict) -> DataFrame:
        if not paths:
            return _typed_empty(spark, manifest)
        return spark.read.parquet(*[os.path.join(root, p) for p in paths])

    def _tag(df: DataFrame, kind: str) -> DataFrame:
        return df.withColumn("_change_type", F.lit(kind))

    if man_from.get("schema") != man_to.get("schema"):
        ins = _tag(_read(man_to["files"], man_to), "insert")
        del_ = _tag(_read(man_from["files"], man_from), "delete")
        return ins.unionByName(del_, allowMissingColumns=True)

    from_files, to_files = set(man_from["files"]), set(man_to["files"])
    only_to = [p for p in man_to["files"] if p not in from_files]
    only_from = [p for p in man_from["files"] if p not in to_files]
    ins = _read(only_to, man_to)
    del_ = _read(only_from, man_from)
    if only_to and only_from:
        return _tag(ins.exceptAll(del_), "insert").unionByName(
            _tag(del_.exceptAll(ins), "delete")
        )
    # one side empty: nothing can cancel — emit directly, zero shuffle
    return _tag(ins, "insert").unionByName(_tag(del_, "delete"))


def changes_since(
    spark: SparkSession, root: str, after_version: int
) -> DataFrame:
    """Tail the zone incrementally: every commit's change feed AFTER
    ``after_version`` up to the current latest, unioned in commit order —
    the consumer loop is ``v = changes_since(spark, root, last_seen)``,
    checkpoint ``max(_commit_version)``, repeat. Append-only histories
    stay manifest-resolved (each commit contributes just its own files);
    an overwrite commit in the range contributes its full
    delete+insert, signalling the consumer to resync. Raises if
    ``after_version`` is ahead of the zone (a consumer checkpoint from a
    different zone)."""
    known = versions(root)
    if not known or after_version > known[-1]:
        raise ValueError(
            f"after_version {after_version} is ahead of {root!r} "
            f"(latest {known[-1] if known else None})"
        )
    todo = [v for v in known if v > after_version]
    if not todo:
        from pyspark.sql import functions as F

        return (
            _typed_empty(spark, _read_manifest(root, known[-1]))
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0))
        )
    # allowMissingColumns: a schema-evolving overwrite commit in the range
    # yields a wider change feed (union of old+new columns) that must still
    # union with earlier commits' old-schema frames — NULL-pad the narrower
    # side instead of dying with an AnalysisException, preserving the
    # documented "overwrite contributes its full delete+insert" contract.
    out = changes(spark, root, todo[0])
    for v in todo[1:]:
        out = out.unionByName(
            changes(spark, root, v), allowMissingColumns=True
        )
    return out


def external_reader_sql(
    root: str, version: int | None = None, table_alias: str | None = None
) -> str:
    """SQL that any parquet-reading engine (DuckDB, Trino, ...) can run
    to read one pinned snapshot of the zone — the open-format proof: a
    versioned zone is plain parquet files plus JSON manifests, so an
    external reader resolves the manifest exactly like
    :func:`read_version` does and gets the same snapshot ISOLATION for
    free (the emitted file list is pinned; commits that land later
    cannot change what the statement reads, and ``vacuum`` never deletes
    files a kept manifest references).

    Returns ``SELECT * FROM read_parquet([...])`` (DuckDB's list form,
    also valid Trino/Athena with minor dialect changes); with
    ``table_alias`` the statement becomes a CREATE VIEW. Empty snapshots
    (an empty micro-batch commit) have no files to read — refused with
    the schema in the message, since ``read_parquet([])`` cannot be
    typed externally."""
    known = versions(root)
    if not known:
        raise ValueError(f"no committed versions under {root!r}")
    v = known[-1] if version is None else version
    if v not in known:
        raise ValueError(f"version {v} not in {known}")
    man = _read_manifest(root, v)
    if not man["files"]:
        raise ValueError(
            f"version {v} is an empty snapshot (schema "
            f"{man.get('schema')!r}) — nothing for an external reader "
            "to open; materialize an empty frame from the schema instead"
        )
    paths = ", ".join(
        "'" + os.path.abspath(os.path.join(root, p)).replace("'", "''") + "'"
        for p in man["files"]
    )
    select = f"SELECT * FROM read_parquet([{paths}])"
    if table_alias:
        return f"CREATE OR REPLACE VIEW {table_alias} AS {select}"
    return select


def rollback(root: str, to_version: int, max_retries: int = 10) -> dict:
    """Publish ``to_version``'s exact file list (and schema — keeping
    the append guard armed) as a NEW version — non-destructive undo: the
    rolled-back-over versions stay readable and inspectable until
    vacuum. Races against concurrent commits with the same
    optimistic-concurrency retry as :func:`commit_version`."""
    src = _read_manifest(root, to_version)
    for _ in range(max_retries):
        new_version = versions(root)[-1] + 1
        body = json.dumps(
            {
                "version": new_version,
                "mode": f"rollback:{to_version}",
                "files": src["files"],
                "rows_added": 0,
                "schema": src.get("schema"),
                "file_stats": src.get("file_stats", {}),
            }
        )
        if _atomic_claim(_manifest_path(root, new_version), body):
            return {"version": new_version, "restored": to_version}
    raise RuntimeError(
        f"rollback lost the optimistic-concurrency race {max_retries} times"
    )


def compact_snapshot(
    spark: SparkSession, root: str, target_partitions: int | None = None
) -> dict:
    """Small-file maintenance for a versioned zone, transactionally: read
    the LATEST snapshot, right-size it, and publish the result as a new
    OVERWRITE commit. Readers pinned to older versions are untouched
    (their manifests still reference the old files), concurrent commits
    lose/win the usual optimistic race, and the superseded small files
    become unreferenced — reclaimed by the next :func:`vacuum`. This is
    the table-format answer to :func:`medallion.compact`'s directory
    swap, which `compact` itself refuses on versioned roots; a commit
    racing the compaction raises ``ConcurrentCommitError`` (never a
    lost update)."""
    base = versions(root)[-1]
    df = read_version(spark, root, base)
    if target_partitions is None:
        files = _read_manifest(root, base)["files"]
        total = sum(
            os.path.getsize(os.path.join(root, p))
            for p in files
            if os.path.exists(os.path.join(root, p))
        )
        target_partitions = max(1, -(-total // (256 << 20)))
    # CONDITIONAL commit: the compacted snapshot is a function of the
    # base it read — publishing after a concurrent append landed would
    # silently drop that append from the latest snapshot. The
    # compare-and-swap raises ConcurrentCommitError instead; re-run
    # compaction in a quieter window.
    out = commit_version(
        df.repartition(target_partitions),
        root,
        mode="overwrite",
        expected_latest=base,
    )
    return {**out, "compacted_to_partitions": target_partitions}


def delete_keys(
    spark: SparkSession,
    root: str,
    col: str,
    values: list,
    max_retries: int = 10,
) -> dict:
    """Key erasure (the GDPR right-to-be-forgotten shape), transactional
    and FILE-PRUNED: publish a new snapshot without any row whose
    ``col`` is in ``values``, rewriting ONLY the files that can contain
    a doomed key. Candidate files are decided from the manifest's
    per-file min/max stats AND blooms (the same predicates
    ``read_version_where`` prunes on), so erasing one user from a 100 TB
    zone reads and rewrites O(files-containing-that-user), not the
    table; every other file is carried into the new manifest by
    REFERENCE, byte-identical on disk. Readers pinned to older versions
    still see the rows (erasure of history = :func:`vacuum` after this
    commit supersedes it); the commit is conditional on the snapshot it
    read (compare-and-swap, like :func:`compact_snapshot`). A lost race
    means the doomed keys may live in commits this pass never scanned,
    so the loser RETRIES from the top — re-read latest, re-prune,
    re-rewrite — up to ``max_retries`` times (the same optimistic loop
    as :func:`commit_version`/:func:`rollback`), raising
    ``ConcurrentCommitError`` only on exhaustion. Rows with NULL keys
    always survive. Deleting keys the zone never contained is a NO-OP:
    no new version is published.

    Returns {version, files_rewritten, files_carried, rows_deleted}
    (or {noop: True, version: base} when nothing matched)."""
    last_err: ConcurrentCommitError | None = None
    for _ in range(max(1, max_retries)):
        try:
            return _delete_keys_once(spark, root, col, values)
        except ConcurrentCommitError as e:
            last_err = e
    raise last_err


def _delete_keys_once(
    spark: SparkSession, root: str, col: str, values: list
) -> dict:
    from pyspark.sql import functions as F

    known = versions(root)
    if not known:
        raise ValueError(f"no versions at {root}")
    base = known[-1]
    man = _read_manifest(root, base)
    stats = man.get("file_stats", {})
    blooms = man.get("file_blooms", {})
    preds_per_value = [[(col, "=", v)] for v in values]
    affected, carried = [], []
    for f in man["files"]:
        st, bl = stats.get(f), blooms.get(f)
        may = any(
            _file_may_match(st, p) and _bloom_may_match(bl, p)
            for p in preds_per_value
        )
        (affected if may else carried).append(f)
    if not affected:
        return {"noop": True, "version": base, "files_rewritten": 0}
    src = spark.read.parquet(
        *[os.path.join(root, f) for f in affected]
    )
    keep = src.filter(F.col(col).isNull() | ~F.col(col).isin(values))
    n_before = src.count()
    commit_dir = f"c-{uuid.uuid4().hex}"
    out_dir = os.path.join(root, _DATA, commit_dir)
    keep.write.mode("overwrite").parquet(out_dir)
    survivors = spark.read.parquet(out_dir)
    rows_deleted = n_before - survivors.count()
    if rows_deleted == 0:
        # stats/bloom false positives only — nothing actually matched;
        # drop the speculative rewrite and publish nothing
        shutil.rmtree(out_dir, ignore_errors=True)
        return {"noop": True, "version": base, "files_rewritten": 0}
    added = sorted(
        os.path.join(_DATA, commit_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    file_stats = {
        f: stats[f] for f in carried if f in stats
    }
    file_stats.update(_collect_file_stats(root, added))
    file_blooms = {f: blooms[f] for f in carried if f in blooms}
    # rebuild blooms for the rewritten files iff the zone indexed this
    # or other columns before, reusing the stored geometry; files
    # without blooms simply never prune (correct, just less tight)
    old_bloom_cols: dict = {}
    for f in affected:
        for c, ent in (blooms.get(f) or {}).items():
            old_bloom_cols[c] = (int(ent["m"]), int(ent["k"]))
    if old_bloom_cols and added:
        import base64

        for c, (m_bits, k_hashes) in old_bloom_cols.items():
            by_base = _collect_file_blooms(
                spark, out_dir, survivors.schema, [c], m_bits, k_hashes
            )
            for rel in added:
                ent = by_base.get(os.path.basename(rel))
                if ent and c in ent:
                    file_blooms.setdefault(rel, {})[c] = {
                        "m": m_bits,
                        "k": k_hashes,
                        "kind": _bloom_kind(survivors.schema[c].dataType),
                        "b64": base64.b64encode(ent[c]).decode("ascii"),
                    }
    new_version = base + 1
    body_dict = {
        "version": new_version,
        "mode": "delete",
        "files": carried + added,
        "rows_added": 0,
        "rows_deleted": rows_deleted,
        "schema": man.get("schema"),
        "file_stats": file_stats,
    }
    if file_blooms:
        body_dict["file_blooms"] = file_blooms
    # conditional on the base snapshot: a concurrent commit means the
    # doomed keys may live in files this pass never scanned
    if not _atomic_claim(
        _manifest_path(root, new_version), json.dumps(body_dict)
    ):
        shutil.rmtree(out_dir, ignore_errors=True)
        raise ConcurrentCommitError(
            f"delete_keys lost the race at version {new_version} — "
            "re-read and retry"
        )
    return {
        "version": new_version,
        "files_rewritten": len(added),
        "files_carried": len(carried),
        "rows_deleted": rows_deleted,
    }


def vacuum(root: str, keep_last: int = 2, min_age_s: float = 600.0) -> dict:
    """Drop all but the last ``keep_last`` manifests and delete every
    data file no kept manifest references. The ONLY destructive
    operation; kept snapshots remain byte-identical readable.

    ``keep_last`` must be ≥ 1 — a zone is never vacuumed to nothing.
    ``min_age_s`` is the in-flight-commit guard (the same retention idea
    as Delta's ``VACUUM ... RETAIN``): a commit writes its data files
    BEFORE its manifest, so an unreferenced file younger than the window
    may belong to a commit that has not published yet — it is skipped,
    not deleted. Crash-orphaned files age past the window and get
    collected on a later vacuum. Stale ``_commits_by_tag`` markers are dropped only
    for versions BELOW the kept window and past the age guard — a
    marker claimed by a commit racing the vacuum (version newer than
    the vacuum's snapshot of latest) must survive, or a stream restart
    would republish its batch (a long-running stream still cannot
    accumulate markers forever)."""
    import time

    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}) — refusing to vacuum "
            "a zone down to zero snapshots"
        )
    cutoff = time.time() - min_age_s
    known = versions(root)
    keep = set(known[-keep_last:])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(root, v)["files"])
    dropped_manifests = 0
    for v in known:
        if v not in keep:
            os.remove(_manifest_path(root, v))
            dropped_manifests += 1
    dropped_files = 0
    skipped_young = 0
    data_root = os.path.join(root, _DATA)
    for commit_dir in list(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for f in list(os.listdir(cdir)):
            rel = os.path.join(_DATA, commit_dir, f)
            full = os.path.join(root, rel)
            if not f.endswith(".parquet") or rel in referenced:
                continue
            if os.path.getmtime(full) > cutoff:
                skipped_young += 1
                continue
            os.remove(full)
            dropped_files += 1
        remaining = os.listdir(cdir)
        # only remove a commit dir that is both empty of data AND old —
        # an in-flight Spark write (e.g. its _temporary/ staging) must
        # survive until its manifest lands or it ages out
        if (
            not any(n.endswith(".parquet") for n in remaining)
            and os.path.getmtime(cdir) <= cutoff
        ):
            shutil.rmtree(cdir)
    tag_dir = os.path.join(root, "_commits_by_tag")
    dropped_markers = 0
    if os.path.isdir(tag_dir):
        for name in list(os.listdir(tag_dir)):
            mpath = os.path.join(tag_dir, name)
            if name.endswith(".tmp"):
                if os.path.getmtime(mpath) <= cutoff:
                    os.remove(mpath)
                    dropped_markers += 1
                continue
            with open(mpath) as f:
                v = json.load(f).get("version")
            # drop only markers of VACUUMED history (below the kept
            # window) that are also past the in-flight age guard: a
            # concurrent commit may claim a version NEWER than the
            # stale `keep` snapshot and write its marker mid-vacuum —
            # removing it would resurrect the batch on stream restart
            # (duplicate publish), the exactly-once contract's one
            # bookkeeping file
            if (
                v is not None
                and v < min(keep)
                and os.path.getmtime(mpath) <= cutoff
            ):
                os.remove(mpath)
                dropped_markers += 1
    return {
        "kept_versions": sorted(keep),
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
        "dropped_markers": dropped_markers,
        "skipped_young_files": skipped_young,
    }
