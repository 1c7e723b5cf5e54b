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


def commit_version(
    df: DataFrame,
    root: str,
    mode: str = "append",
    max_retries: int = 10,
    batch_tag: str | None = None,
) -> dict:
    """Write ``df`` as a new snapshot of the zone.

    ``mode='append'`` publishes previous-latest files + this commit's;
    ``'overwrite'`` publishes only this commit's (old snapshots stay
    readable until vacuumed). ``batch_tag`` makes the commit IDEMPOTENT
    under replay: a marker in ``_commits_by_tag/`` is created atomically
    with publication, and a second commit carrying the same tag is a
    no-op (the streaming-restart contract — see
    :func:`versioned_batch_writer`). Returns {version, files_added,
    rows} (or {skipped_replay: True, ...} for a deduplicated replay).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if batch_tag is not None:
        marker = os.path.join(root, "_commits_by_tag", batch_tag)
        if os.path.exists(marker):
            with open(marker) as f:
                return {"skipped_replay": True, **json.load(f)}
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    commit_dir = f"c-{uuid.uuid4().hex}"
    os.makedirs(os.path.join(root, _MANIFESTS), exist_ok=True)
    # append-time schema guard: a snapshot whose files disagree on
    # columns reads through ONE sampled footer and silently drops the
    # others' columns — refuse the mixed append instead. (Overwrite
    # starts a fresh file list, so evolution happens naturally there.)
    known_now = versions(root)
    if mode == "append" and known_now:
        prev = _read_manifest(root, known_now[-1]).get("schema")
        cur = df.schema.simpleString()
        if prev is not None and prev != cur:
            raise ValueError(
                "append schema mismatch vs latest snapshot:\n"
                f"  snapshot: {prev}\n  commit:   {cur}\n"
                "overwrite to evolve the schema, or align the columns"
            )
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

    for _ in range(max_retries):
        known = versions(root)
        new_version = (known[-1] + 1) if known else 0
        files = list(added)
        if mode == "append" and known:
            files = _read_manifest(root, known[-1])["files"] + files
        target = _manifest_path(root, new_version)
        body = json.dumps(
            {
                "version": new_version,
                "mode": mode,
                "files": files,
                "rows_added": rows,
                "schema": df.schema.simpleString(),
            }
        )
        try:
            # O_EXCL: exactly one writer can create v<N> — the loser
            # re-reads the NEW latest and retries on top of it
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            f.write(body)
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


def versioned_batch_writer(root: str, mode: str = "append"):
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
            batch_df, root, mode=mode, batch_tag=f"stream-{batch_id}"
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
    files = _read_manifest(root, v)["files"]
    if not files:
        schema = spark.read.parquet(
            os.path.join(root, _DATA)
        ).schema  # pragma: no cover - empty commits keep prior schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*[os.path.join(root, p) for p in files])


def rollback(root: str, to_version: int) -> dict:
    """Publish ``to_version``'s exact file list as a NEW version —
    non-destructive undo: the rolled-back-over versions stay readable
    and inspectable until vacuum."""
    files = _read_manifest(root, to_version)["files"]
    known = versions(root)
    new_version = known[-1] + 1
    target = _manifest_path(root, new_version)
    fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        f.write(
            json.dumps(
                {
                    "version": new_version,
                    "mode": f"rollback:{to_version}",
                    "files": files,
                    "rows_added": 0,
                }
            )
        )
    return {"version": new_version, "restored": to_version}


def vacuum(root: str, keep_last: int = 2) -> dict:
    """Drop all but the last ``keep_last`` manifests and delete every
    data file no kept manifest references. The ONLY destructive
    operation; kept snapshots remain byte-identical readable."""
    known = versions(root)
    keep = set(known[-keep_last:]) if keep_last > 0 else set()
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(root, v)["files"])
    dropped_manifests = 0
    for v in known:
        if v not in keep:
            os.remove(_manifest_path(root, v))
            dropped_manifests += 1
    dropped_files = 0
    data_root = os.path.join(root, _DATA)
    for commit_dir in list(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for f in list(os.listdir(cdir)):
            rel = os.path.join(_DATA, commit_dir, f)
            if f.endswith(".parquet") and rel not in referenced:
                os.remove(os.path.join(root, rel))
                dropped_files += 1
        if not any(n.endswith(".parquet") for n in os.listdir(cdir)):
            shutil.rmtree(cdir)
    return {
        "kept_versions": sorted(keep),
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
    }
