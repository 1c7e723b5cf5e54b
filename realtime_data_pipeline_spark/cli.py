"""Runnable pipeline jobs — the engine-shaped replacement for the
reference's per-script CLIs + PowerShell orchestrator
(``spark_jobs/batch_etl.py:6-16``, ``write_silver.py:5-12``,
``dq_checks.py`` flags, ``run_full_pipeline.ps1``).

    python -m realtime_data_pipeline_spark.cli bronze --raw ... --bronze ...
    python -m realtime_data_pipeline_spark.cli silver --bronze ... --silver ...
    python -m realtime_data_pipeline_spark.cli pipeline --root ZONESROOT ...

Exit codes: 0 ok, 2 DQ gate failure (parity: ``dq_checks.py:119-120``).
Each stage is a library call (``medallion.run_bronze`` / ``run_silver``)
so any orchestrator — Airflow, cron, the shell — can run them the way the
reference's DAG shells out (``dags/etl_daily.py:20-33``).
"""

from __future__ import annotations

import argparse
import sys
import time

from realtime_data_pipeline_spark import dq, medallion
from realtime_data_pipeline_spark.session import get_spark

# per-stage wall durations of the most recent `assemble` run (stage name
# -> seconds), for bench/ops attribution. Spark is lazy, so transformation
# stages record their PLAN-BUILD cost (driver-side Catalyst work — real
# regressions show up there too) plus any eager actions they contain
# (link_rank's pagerank iterations, its quantile cut); the deferred
# execution tail of every lazy stage lands in `pack_write`.
LAST_ASSEMBLE_STAGES: dict[str, float] = {}


def _parse_rules(specs: list[str] | None) -> list[dq.Rule]:
    """``--rule name:SQL-predicate`` (repeatable) — predicate is a SQL
    boolean expression that is TRUE for VIOLATING rows. Falls back to the
    built-in value-column rule when none given."""
    from pyspark.sql import functions as F

    if not specs:
        return [
            dq.Rule(
                "neg_or_null_value",
                (F.col("value") < 0) | F.col("value").isNull(),
                description="value must be non-null and >= 0",
            ),
        ]
    rules = []
    for spec in specs:
        name, _, pred = spec.partition(":")
        if not pred:
            raise SystemExit(f"--rule must be name:predicate, got {spec!r}")
        rules.append(dq.Rule(name, F.expr(pred), description=pred))
    return rules


def _parse_where(specs: list[str]) -> list[tuple]:
    """``--where 'col<op>value'`` (op: = < <= > >=) -> (col, op, literal)
    tuples for versioned.prune_report / read_version_where; numeric
    literals parse as numbers, everything else passes as text — date
    literals compare as ISO strings and timestamp-shaped literals
    (space- or T-separated, truncated forms included) are parsed and
    compared CHRONOLOGICALLY against the recorded footer stats, so raw
    CLI text can never mis-prune on separator or precision differences
    (versioned._file_may_match's kind-aware comparison)."""
    import re as _re

    preds = []
    for w in specs:
        m = _re.match(r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*(.+?)\s*$", w)
        if not m:
            raise SystemExit(
                f"cannot parse --where {w!r} "
                "(expected col<op>value with op = < <= > >=)"
            )
        col, op, raw = m.groups()
        val: object = raw
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                pass
        preds.append((col, op, val))
    return preds


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="realtime_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("bronze", help="raw parquet -> partitioned bronze")
    pb.add_argument("--raw", required=True)
    pb.add_argument("--bronze", required=True)
    pb.add_argument("--ts-col", required=True)
    pb.add_argument("--keep-cols", required=True, help="comma-separated")
    pb.add_argument("--date-col", default="event_date")
    pb.add_argument("--mode", choices=["overwrite", "append"], default="overwrite")

    ps = sub.add_parser("silver", help="bronze -> DQ gate -> silver+quarantine")
    ps.add_argument("--bronze", required=True)
    ps.add_argument("--silver", required=True)
    ps.add_argument("--quarantine", required=True)
    ps.add_argument("--artifacts", default=None)
    ps.add_argument("--warn-only", action="store_true")
    ps.add_argument("--mode", choices=["overwrite", "append"], default="overwrite")
    ps.add_argument(
        "--rule", action="append", default=None,
        help="name:SQL-predicate true for violating rows (repeatable)",
    )

    pr = sub.add_parser(
        "replay", help="re-adjudicate quarantine under current rules; promote passes to silver"
    )
    pr.add_argument("--quarantine", required=True)
    pr.add_argument("--silver", required=True)
    pr.add_argument(
        "--rule", action="append", default=None,
        help="name:SQL-predicate true for violating rows (repeatable)",
    )
    pr.add_argument(
        "--partition-by", default=None,
        help="hive partition layout of the silver/quarantine zones "
        "(e.g. batch_id for stream-produced zones); default auto-detects "
        "from the quarantine directory layout",
    )

    pst = sub.add_parser(
        "stream",
        help="run the DQ-gated streaming pipeline over an inbox (availableNow catch-up)",
    )
    pst.add_argument("--inbox", required=True)
    pst.add_argument("--silver", required=True)
    pst.add_argument("--quarantine", required=True)
    pst.add_argument("--checkpoint", required=True)
    pst.add_argument(
        "--schema", default=None,
        help="DDL schema of the inbox files (required unless --schema-from)",
    )
    pst.add_argument(
        "--schema-from", default=None,
        help="parquet path whose schema the inbox files follow",
    )
    pst.add_argument("--format", default="csv", choices=["csv", "parquet", "json"])
    pst.add_argument("--max-files-per-trigger", type=int, default=1)
    pst.add_argument("--timeout-sec", type=int, default=600)
    pst.add_argument(
        "--rule", action="append", default=None,
        help="name:SQL-predicate true for violating rows (repeatable)",
    )
    pst.add_argument(
        "--redact-text-col", default=None, metavar="COL",
        help="run in-stream PII redaction on COL for clean rows",
    )
    pst.add_argument(
        "--strip-boilerplate", action="store_true",
        help="also rewrite batch-repeated 5-gram spans out of the text "
        "column on the clean side (requires --redact-text-col to name "
        "the text column and an 'doc_id' id column in the stream)",
    )
    pst.add_argument(
        "--id-col", default="doc_id",
        help="id column for --strip-boilerplate span bookkeeping",
    )

    pin = sub.add_parser(
        "ingest",
        help="streaming corpus-dedup ingest: only never-seen docs land in silver",
    )
    pin.add_argument("--inbox", required=True)
    pin.add_argument("--silver", required=True)
    pin.add_argument("--index", required=True, help="fingerprint index root")
    pin.add_argument("--checkpoint", required=True)
    pin.add_argument("--content-col", default="text")
    pin.add_argument("--id-col", default="doc_id")
    pin.add_argument("--schema", default=None)
    pin.add_argument("--schema-from", default=None)
    pin.add_argument("--format", default="csv", choices=["csv", "parquet", "json"])
    pin.add_argument("--max-files-per-trigger", type=int, default=1)
    pin.add_argument("--timeout-sec", type=int, default=600)
    pin.add_argument(
        "--near", action="store_true",
        help="near-duplicate dedup (MinHash-LSH vs the signature index) "
        "instead of exact content fingerprints",
    )
    pin.add_argument(
        "--jaccard", type=float, default=0.5,
        help="near-dup verify threshold (with --near)",
    )
    pin.add_argument(
        "--semantic", action="store_true",
        help="SEMANTIC (embedding-space) dedup vs the kept-vector index "
        "instead of exact content fingerprints (SemDeDup shape)",
    )
    pin.add_argument(
        "--vec-col", default="embedding",
        help="embedding column (with --semantic)",
    )
    pin.add_argument(
        "--tau", type=float, default=0.35,
        help="within-bucket cosine threshold (with --semantic)",
    )
    pin.add_argument(
        "--bits", type=int, default=8,
        help="orthant-quantizer sign bits, 2^bits cells (with --semantic)",
    )

    pru = sub.add_parser(
        "rollup",
        help="continuous rollup: inbox stream -> per-window partials -> merged view",
    )
    pru.add_argument("--inbox", required=True)
    pru.add_argument("--out", required=True, help="rollup partials root")
    pru.add_argument("--checkpoint", required=True)
    pru.add_argument("--ts-col", required=True)
    pru.add_argument("--value-col", required=True)
    pru.add_argument("--window", default="5 minutes")
    pru.add_argument(
        "--distinct-col", default=None,
        help="maintain approx distinct count of COL via mergeable HLL sketches",
    )
    pru.add_argument(
        "--histogram", default=None, metavar="LO:HI:BINS",
        help="maintain approx per-window quantiles of --value-col via "
        "mergeable fixed-bin histogram partials (error <= one bin width)",
    )
    pru.add_argument("--schema", default=None)
    pru.add_argument("--schema-from", default=None)
    pru.add_argument("--format", default="csv", choices=["csv", "parquet", "json"])
    pru.add_argument("--timeout-sec", type=int, default=600)
    pru.add_argument(
        "--compact", action="store_true",
        help="fold batch partials into one partition after catch-up",
    )

    pm = sub.add_parser(
        "maintain", help="table maintenance: small-file compaction and/or TTL retention"
    )
    pm.add_argument("--path", required=True)
    pm.add_argument("--compact", action="store_true")
    pm.add_argument("--partition-by", default=None)
    pm.add_argument(
        "--retain-from", default=None, metavar="CUTOFF",
        help="drop partitions of --partition-by sorting below CUTOFF (ISO date)",
    )
    pm.add_argument(
        "--compact-stream-index", default=None,
        choices=["fp", "neardup", "semdedup", "fuzzy"],
        help="fold a streaming ingest index's per-batch partitions into "
        "batch_id=-1 (--path is the index root; run in a quiet window "
        "after the stream's checkpoint committed)",
    )

    pi = sub.add_parser(
        "index",
        help="build/merge the persisted dedup and ANN indexes (daily-ingest path)",
    )
    pi.add_argument(
        "--kind", required=True, choices=["fp", "neardup", "ivf", "semdedup"],
        help="fp = content-fingerprint dedup index; neardup = MinHash "
        "signature+band index; ivf = cell-partitioned vector index; "
        "semdedup = kept-embedding semantic-dedup index (SemDeDup)",
    )
    pi.add_argument("--index", required=True, help="index root path")
    pi.add_argument(
        "--batch", required=True,
        help="parquet path of the new batch (on first run, the corpus)",
    )
    pi.add_argument("--id-col", default="doc_id")
    pi.add_argument("--content-col", default="text", help="fp/neardup text column")
    pi.add_argument("--vec-col", default="embedding", help="ivf vector column")
    pi.add_argument("--centroids", type=int, default=64, help="ivf cell count")
    pi.add_argument(
        "--fresh-out", default=None,
        help="fp/neardup/semdedup: write the batch rows that survived "
        "dedup here",
    )
    pi.add_argument(
        "--tau", type=float, default=0.9,
        help="semdedup: within-bucket round-6 cosine at/above which a "
        "batch vector is a semantic duplicate",
    )
    pi.add_argument(
        "--bits", type=int, default=8,
        help="semdedup: orthant-quantizer sign bits (2^bits cells)",
    )

    pl = sub.add_parser(
        "link",
        help="fuzzy entity matching (record linkage): Levenshtein-bounded "
        "pairs via complete symmetric-delete blocking + exact verify",
    )
    pl.add_argument("--left", required=True, help="left table parquet")
    pl.add_argument(
        "--right", default=None,
        help="right table parquet; omit for self-pairs within --left",
    )
    pl.add_argument("--out", required=True, help="pairs output parquet")
    pl.add_argument("--left-id", default="id")
    pl.add_argument("--right-id", default="id")
    pl.add_argument("--left-key", default="name")
    pl.add_argument("--right-key", default="name")
    pl.add_argument(
        "--dist", type=int, default=1,
        help="max Levenshtein distance (1 or 2 — the range the "
        "symmetric-delete completeness argument covers)",
    )

    pas = sub.add_parser(
        "assemble",
        help="assemble training shards: hash split -> reproducible "
        "shard shuffle -> context-block packing manifest",
    )
    pas.add_argument("--docs", required=True, help="curated docs parquet")
    pas.add_argument("--out", required=True, help="shard output root")
    pas.add_argument("--id-col", default="doc_id")
    pas.add_argument("--text-col", default="text")
    pas.add_argument("--shards", type=int, default=16)
    pas.add_argument("--seed", type=int, default=42)
    pas.add_argument("--ctx-len", type=int, default=1024)
    pas.add_argument(
        "--split", choices=["train", "eval", "all"], default="train",
        help="keep only this side of the content-hash split (md5 first "
        "nibble <= 'c' is train, ~13/16)",
    )
    pas.add_argument(
        "--link-edges", default=None,
        help="parquet edge list (src, dst = id-col values); when given, "
        "PageRank is computed over it and low-rank documents are culled "
        "before the split (link-farm demotion)",
    )
    pas.add_argument(
        "--min-rank-pct", type=float, default=10.0,
        help="drop LINKED documents whose PageRank falls below this "
        "percentile of all node ranks; documents absent from the graph "
        "are kept (no link evidence either way)",
    )
    pas.add_argument(
        "--rank-iterations", type=int, default=10,
        help="PageRank power iterations over --link-edges",
    )
    pas.add_argument(
        "--strip-boilerplate", action="store_true",
        help="rewrite documents with corpus-repeated 5-gram spans "
        "removed (text.strip_boilerplate) before splitting/packing — "
        "boilerplate never reaches the training shards",
    )
    pas.add_argument(
        "--boiler-min-df", type=int, default=3,
        help="a 5-gram is boilerplate when it appears in at least this "
        "many distinct documents",
    )
    pas.add_argument(
        "--decontaminate-eval", default=None, metavar="PARQUET",
        help="path to an eval/benchmark document table: every train "
        "span sharing a word 5-gram with ANY eval doc is removed "
        "(text.strip_contaminated) before splitting/packing — leaked "
        "benchmark passages never reach the training shards",
    )
    pas.add_argument(
        "--eval-text-col", default=None,
        help="text column of --decontaminate-eval (default: --text-col)",
    )
    pas.add_argument(
        "--embeddings", default=None,
        help="parquet of (--vec-id-col, --vec-col) document embeddings; "
        "when given, semantically-dominated documents (a similar "
        "smaller-id bucket-mate at --semdedup-tau, SemDeDup shape) are "
        "dropped before the split; docs without an embedding are kept",
    )
    pas.add_argument(
        "--vec-id-col", default="vec_id",
        help="--embeddings id column (joined to --id-col values)",
    )
    pas.add_argument("--vec-col", default="embedding")
    pas.add_argument(
        "--bpe-merges", default=None, metavar="PARQUET",
        help="path to saved BPE merges (tokenizer.save_bpe); packing "
        "weights then use REAL trained-tokenizer counts instead of the "
        "token_count_re regex proxy",
    )
    pas.add_argument(
        "--quality-model", default=None, metavar="PARQUET",
        help="path to a saved logistic quality model "
        "(classifier.save_logreg); documents are scored map-only with "
        "hash_features(--text-col, model.dim, --quality-feat-seed) and "
        "those below --quality-min-score are dropped before the split "
        "— the trained sibling of the heuristic quality band",
    )
    pas.add_argument(
        "--quality-min-score", type=float, default=0.5,
        help="drop documents whose model score is below this",
    )
    pas.add_argument(
        "--quality-feat-seed", type=int, default=41,
        help="hash_features seed the model was trained with",
    )
    pas.add_argument(
        "--domain-cap", type=int, default=None,
        help="keep at most this many documents per --domain-col value "
        "(deterministic md5-rank selection — the anti-domination pass); "
        "applied before the split so one mega-domain cannot swamp the "
        "shards",
    )
    pas.add_argument(
        "--domain-col", default="source",
        help="column holding the domain/source key for --domain-cap",
    )
    pas.add_argument(
        "--curriculum", action="store_true",
        help="curriculum ordering: band documents by quality "
        "(high=stage 0 first, low=stage 2 last), keep shard positions "
        "dense per (stage, shard), and pack stage-major — the manifest "
        "carries stage AND shard columns",
    )
    pas.add_argument(
        "--semdedup-tau", type=float, default=0.9,
        help="within-bucket round-6 cosine at/above which the larger-id "
        "document is a semantic duplicate",
    )
    pas.add_argument(
        "--semdedup-bits", type=int, default=8,
        help="orthant-quantizer sign bits (2^bits coarse cells)",
    )

    psy = sub.add_parser(
        "synth",
        help="generate synthetic events via the custom Python data source",
    )
    psy.add_argument("--out", required=True, help="parquet output path")
    psy.add_argument("--rows", type=int, default=100_000)
    psy.add_argument("--partitions", type=int, default=32)
    psy.add_argument("--users", type=int, default=1000)
    psy.add_argument(
        "--step-us", type=int, default=1_000_000,
        help="event-time gap between consecutive rows (microseconds)",
    )

    ptt = sub.add_parser(
        "timetravel",
        help="versioned-zone maintenance: log / show / changes / diff "
        "/ compact / rollback / vacuum / prune / erase",
    )
    ptt.add_argument(
        "action",
        choices=[
            "log", "show", "changes", "diff", "compact", "rollback",
            "vacuum", "prune", "erase",
        ],
    )
    ptt.add_argument(
        "--col", default=None,
        help="erase: the key column whose values are to be deleted",
    )
    ptt.add_argument(
        "--values", default=None,
        help="erase: comma-separated key values (all-digit values parse "
        "as ints); only files that can contain one are rewritten",
    )
    ptt.add_argument("--root", required=True, help="versioned zone root")
    ptt.add_argument(
        "--version", type=int, default=None,
        help="show: pin a version; changes: the commit to diff",
    )
    ptt.add_argument(
        "--minimal", action="store_true",
        help="changes: row-level delta for overwrite commits",
    )
    ptt.add_argument(
        "--to", type=int, default=None,
        help="rollback target version; diff: the span's right endpoint",
    )
    ptt.add_argument(
        "--from", dest="from_version", type=int, default=None,
        help="diff: the span's left endpoint",
    )
    ptt.add_argument("--keep-last", type=int, default=2, help="vacuum retention")
    ptt.add_argument(
        "--min-age-sec", type=float, default=600.0,
        help="vacuum: never delete unreferenced files younger than this "
        "(in-flight commit guard)",
    )
    ptt.add_argument("--limit", type=int, default=10, help="show: rows printed")
    ptt.add_argument(
        "--where", action="append", default=[],
        help="prune/show: predicate 'col<op>value' (op: = < <= > >=), "
        "repeatable — prune reports skip counts; show runs a "
        "stats-pruned read",
    )

    ps2 = sub.add_parser(
        "scd2",
        help="historized dimension (SCD2): merge observation batches / "
        "query current or as-of state",
    )
    ps2.add_argument(
        "action", choices=["merge", "stream", "enrich", "current", "asof"]
    )
    ps2.add_argument("--target", required=True, help="dimension root path")
    ps2.add_argument("--batch", default=None, help="merge: observation batch path")
    ps2.add_argument(
        "--format", default="parquet", choices=["parquet", "orc", "csv", "json"]
    )
    ps2.add_argument("--schema", default=None, help="merge: batch schema (csv/json)")
    ps2.add_argument("--keys", default=None, help="merge: comma-separated key cols")
    ps2.add_argument("--effective", default=None, help="merge: observation-time col")
    ps2.add_argument(
        "--tracked", default=None,
        help="merge: comma-separated tracked cols (default: all non-key)",
    )
    ps2.add_argument("--buckets", type=int, default=256)
    ps2.add_argument("--at", default=None, help="asof: ISO timestamp")
    ps2.add_argument(
        "--inbox", default=None,
        help="stream: observation inbox; enrich: fact inbox",
    )
    ps2.add_argument(
        "--ts-col", default=None, help="enrich: fact event-time column"
    )
    ps2.add_argument(
        "--out", default=None, help="enrich: enriched-facts sink path"
    )
    ps2.add_argument("--checkpoint", default=None, help="stream: checkpoint dir")
    ps2.add_argument(
        "--zone", default=None,
        help="stream: tail a VERSIONED ZONE of observation commits "
        "instead of a file inbox (zone_changes source)",
    )
    ps2.add_argument("--max-files-per-trigger", type=int, default=1)
    ps2.add_argument("--timeout-sec", type=int, default=600)
    ps2.add_argument("--limit", type=int, default=20, help="current/asof: rows printed")

    ppr = sub.add_parser(
        "profile",
        help="one-scan column profile: rows, nulls, distinct, min/max",
    )
    ppr.add_argument("--path", required=True)
    ppr.add_argument(
        "--format", default="parquet", choices=["parquet", "orc", "csv", "json"]
    )
    ppr.add_argument("--schema", default=None, help="csv/json schema")
    ppr.add_argument("--columns", default=None, help="comma-separated subset")
    ppr.add_argument(
        "--exact-ndv", action="store_true",
        help="exact COUNT DISTINCT instead of HLL approx",
    )

    pdr = sub.add_parser(
        "drift",
        help="embedding drift gate: per-dim PSI + Welch t between two "
        "corpora; nonzero exit if any dimension crosses a gate",
    )
    pdr.add_argument(
        "--ref", default=None,
        help="reference corpus parquet path (PSI + t gates)",
    )
    pdr.add_argument(
        "--ref-hist", default=None,
        help="persisted reference_histogram path (PSI gate only — the "
        "streaming monitor's reference; mutually exclusive with --ref)",
    )
    pdr.add_argument("--cur", required=True, help="current parquet path")
    pdr.add_argument(
        "--save-ref-hist", default=None,
        help="with --ref: also persist the reference histogram here "
        "for later --ref-hist / streaming-monitor runs",
    )
    pdr.add_argument("--vec-col", default="embedding")
    pdr.add_argument("--psi-bins", type=int, default=10)
    pdr.add_argument("--lo", type=float, default=-4.0)
    pdr.add_argument("--hi", type=float, default=4.0)
    pdr.add_argument(
        "--gate-psi", type=float, default=0.25,
        help="PSI action threshold (credit-scoring rule of thumb)",
    )
    pdr.add_argument(
        "--gate-t", type=float, default=3.0,
        help="|t| threshold for the mean-shift gate",
    )
    pdr.add_argument(
        "--ks-alpha", type=float, default=0.01,
        help="significance level for the distribution-free KS gate in "
        "BOTH --ref and --ref-hist modes (flag at D > "
        "c(alpha)*sqrt((n1+n2)/(n1*n2)), c(alpha)=sqrt(-ln(alpha/2)/2) "
        "so any level in (0,1) works; c(0.01)=1.628, c(0.05)=1.358; "
        "in --ref-hist mode n1 is the persisted per-dim sample size)",
    )

    pp = sub.add_parser(
        "pipeline", help="fetch >> bronze >> DQ-gated silver (daily run)"
    )
    pp.add_argument("--source-url", required=True)
    pp.add_argument("--root", required=True, help="zones root directory")
    pp.add_argument("--ts-col", required=True)
    pp.add_argument("--keep-cols", required=True, help="comma-separated")
    pp.add_argument("--date-col", default="event_date")
    pp.add_argument("--warn-only", action="store_true")
    pp.add_argument(
        "--rule", action="append", default=None,
        help="name:SQL-predicate true for violating rows (repeatable)",
    )

    args = p.parse_args(argv)
    # timetravel log/rollback/vacuum are pure-filesystem maintenance —
    # skip the multi-second JVM/session startup for them (show/changes/
    # compact run queries and fall through to the session path)
    if args.cmd == "timetravel" and args.action not in (
        "show", "changes", "diff", "compact", "erase"
    ):
        import json as _json

        from realtime_data_pipeline_spark import versioned

        if not versioned.versions(args.root):
            raise SystemExit(
                f"timetravel {args.action}: no committed versions under "
                f"{args.root!r} (fresh or wrong --root?)"
            )
        if args.action == "log":
            for v in versioned.versions(args.root):
                m = versioned._read_manifest(args.root, v)
                print(
                    f"v{v}  mode={m['mode']}  files={len(m['files'])}  "
                    f"rows_added={m['rows_added']}"
                )
            return 0
        if args.action == "prune":
            if not args.where:
                raise SystemExit(
                    "timetravel prune: at least one --where is required"
                )
            print(
                _json.dumps(
                    versioned.prune_report(
                        args.root,
                        _parse_where(args.where),
                        version=args.version,
                    )
                )
            )
            return 0
        if args.action == "rollback":
            if args.to is None:
                raise SystemExit("timetravel rollback: --to is required")
            if args.to not in versioned.versions(args.root):
                raise SystemExit(
                    f"timetravel rollback: version {args.to} not in "
                    f"{versioned.versions(args.root)}"
                )
            print(_json.dumps(versioned.rollback(args.root, args.to)))
            return 0
        print(
            _json.dumps(
                versioned.vacuum(
                    args.root,
                    keep_last=args.keep_last,
                    min_age_s=args.min_age_sec,
                )
            )
        )
        return 0
    # getOrCreate: reuses an existing session (tests, notebooks); as a real
    # CLI the session dies with the process, so no explicit stop()
    spark = get_spark(app_name=f"rdp-{args.cmd}")
    if args.cmd == "bronze":
        metrics = medallion.run_bronze(
            spark,
            args.raw,
            args.bronze,
            ts_col=args.ts_col,
            keep_cols=[c.strip() for c in args.keep_cols.split(",")],
            date_col=args.date_col,
            mode=args.mode,
        )
        print(f"bronze: {metrics['rows']} rows -> {args.bronze}")
        return 0
    if args.cmd == "silver":
        try:
            report = medallion.run_silver(
                spark,
                args.bronze,
                args.silver,
                args.quarantine,
                rules=_parse_rules(args.rule),
                artifacts_dir=args.artifacts,
                warn_only=args.warn_only,
                mode=args.mode,
            )
        except dq.DQCheckFailed as e:
            print(f"DQ gate FAILED: {e.failed_rules}", file=sys.stderr)
            return 2
        status = "passed" if report.passed else "warned"
        print(f"silver: DQ {status} -> {args.silver}")
        return 0
    if args.cmd == "timetravel":  # show/changes/compact (see above)
        from realtime_data_pipeline_spark import versioned

        if args.action == "compact":
            import json as _json

            print(_json.dumps(versioned.compact_snapshot(spark, args.root)))
        elif args.action == "erase":
            import json as _json

            if not args.col or not args.values:
                raise SystemExit(
                    "timetravel erase: --col and --values are required"
                )
            vals = [
                int(v) if v.lstrip("-").isdigit() else v
                for v in args.values.split(",")
            ]
            print(
                _json.dumps(
                    versioned.delete_keys(spark, args.root, args.col, vals)
                )
            )
        elif args.action == "changes":
            if args.version is None:
                raise SystemExit("timetravel changes: --version is required")
            versioned.changes(
                spark, args.root, args.version, minimal=args.minimal
            ).show(args.limit, truncate=False)
        elif args.action == "diff":
            if args.from_version is None or args.to is None:
                raise SystemExit(
                    "timetravel diff: --from and --to are required"
                )
            versioned.diff_versions(
                spark, args.root, args.from_version, args.to
            ).show(args.limit, truncate=False)
        else:
            if args.where:
                # stats-pruned read: provably-dead files never reach the
                # scan; result identical to read_version().filter(...)
                view = versioned.read_version_where(
                    spark, args.root, _parse_where(args.where),
                    version=args.version,
                )
            else:
                view = versioned.read_version(spark, args.root, args.version)
            view.show(args.limit, truncate=False)
        return 0
    if args.cmd == "link":
        from realtime_data_pipeline_spark import fuzzy

        left = spark.read.parquet(args.left)
        if args.right is None:
            pairs = fuzzy.fuzzy_self_pairs(
                left, args.left_id, args.left_key, max_dist=args.dist
            )
        else:
            pairs = fuzzy.fuzzy_join(
                left,
                spark.read.parquet(args.right),
                args.left_id,
                args.right_id,
                args.left_key,
                args.right_key,
                max_dist=args.dist,
            )
        pairs.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"link: {n} pairs within dist {args.dist} -> {args.out}")
        return 0
    if args.cmd == "assemble":
        from pyspark.sql import functions as F

        from realtime_data_pipeline_spark import packing, text

        # the stage-major composite order below bands shard into the
        # [1e9, 1e12) range; shards >= 1000 (or shards >= 1e9 rows per
        # shard) would overflow the band and silently interleave stages
        if args.shards >= 1000:
            raise SystemExit(
                "assemble: --shards must be < 1000 (the stage-major "
                f"ordering bands shard*1e9 under stage*1e12); got {args.shards}"
            )
        LAST_ASSEMBLE_STAGES.clear()
        _t_mark = [time.perf_counter()]

        def _mark(stage: str) -> None:
            now = time.perf_counter()
            LAST_ASSEMBLE_STAGES[stage] = round(now - _t_mark[0], 3)
            _t_mark[0] = now

        docs = spark.read.parquet(args.docs)
        _mark("read")
        if args.embeddings:
            # semantic dedup first: it is the cheapest corpus reduction
            # (bucketed pair volume, no text shuffle) and every later
            # stage then works on fewer rows. Keep/drop is decided in
            # embedding space; docs without an embedding row carry no
            # similarity evidence and pass through (same contract as
            # the link-rank cull below).
            from realtime_data_pipeline_spark import similarity

            marked = similarity.semantic_dedup(
                spark.read.parquet(args.embeddings),
                threshold=args.semdedup_tau,
                id_col=args.vec_id_col,
                vec_col=args.vec_col,
                n_bits=args.semdedup_bits,
            )
            dropped = marked.filter(~F.col("is_kept")).select(
                F.col(args.vec_id_col).alias(args.id_col)
            )
            docs = docs.join(dropped, args.id_col, "left_anti")
            _mark("semantic_dedup")
        if args.link_edges:
            # link-graph demotion: rank every node of the provided edge
            # list, find the percentile cutoff (bounded 1-row driver
            # scalar), and cull linked docs below it. Docs outside the
            # graph carry no link evidence and pass through.
            from realtime_data_pipeline_spark import graph

            ranks = graph.pagerank(
                spark.read.parquet(args.link_edges),
                src="src",
                dst="dst",
                iterations=args.rank_iterations,
            )
            thr = ranks.approxQuantile(
                "rank", [args.min_rank_pct / 100.0], 0.001
            )[0]
            docs = (
                docs.join(
                    ranks.withColumnRenamed("node", args.id_col),
                    args.id_col,
                    "left",
                )
                .filter(F.col("rank").isNull() | (F.col("rank") >= thr))
                .drop("rank")
            )
            _mark("link_rank")
        if args.strip_boilerplate:
            # clean repeated spans BEFORE the content-hash split: the
            # split and the packing weights must see the text that will
            # actually be trained on
            docs = text.strip_boilerplate(
                docs,
                id_col=args.id_col,
                text_col=args.text_col,
                min_df=args.boiler_min_df,
            )
            _mark("strip_boilerplate")
        if args.decontaminate_eval:
            # excise eval-shared spans AFTER boilerplate (boilerplate
            # grams are corpus-wide; what's left that still matches
            # eval is genuine leakage) and BEFORE the split/packing so
            # weights and shards see the text that will be trained on
            docs = text.strip_contaminated(
                docs,
                spark.read.parquet(args.decontaminate_eval),
                id_col=args.id_col,
                text_col=args.text_col,
                eval_text_col=args.eval_text_col,
            )
            _mark("decontaminate")
        if args.quality_model:
            # trained quality gate AFTER the text rewrites (score the
            # text that will be trained on) and BEFORE the cap/split:
            # one map-only scoring pass, no shuffle; the model rode in
            # as dim+1 float64s
            from realtime_data_pipeline_spark import classifier

            qmodel = classifier.load_logreg(spark, args.quality_model)
            feats = classifier.hash_features(
                F.col(args.text_col),
                n_buckets=qmodel["dim"],
                seed=args.quality_feat_seed,
            )
            docs = (
                classifier.logreg_score(
                    docs.withColumn("__qx", feats), qmodel, "__qx",
                    out_col="__qscore",
                )
                .filter(F.col("__qscore") >= args.quality_min_score)
                .drop("__qx", "__qscore")
            )
            _mark("quality_model")
        if args.domain_cap is not None:
            # anti-domination cap BEFORE the split: at most N docs per
            # domain, selected by deterministic content-hash rank (the
            # docs_domain_cap query's construction) so the kept subset
            # is a pure function of the corpus, not arrival order. One
            # shuffle on the domain key; WindowGroupLimit keeps map
            # tasks from forwarding more than N rows per domain.
            from pyspark.sql import Window as _W

            dw = _W.partitionBy(args.domain_col).orderBy(
                F.md5(F.col(args.text_col)).asc(),
                F.col(args.id_col).asc(),
            )
            docs = (
                docs.withColumn("__drank", F.row_number().over(dw))
                .filter(F.col("__drank") <= args.domain_cap)
                .drop("__drank")
            )
            _mark("domain_cap")
        if args.split != "all":
            side = F.when(
                F.substring(F.md5(F.col(args.text_col)), 1, 1) <= "c",
                "train",
            ).otherwise("eval")
            docs = docs.filter(side == args.split)
        if args.curriculum:
            # curriculum staging (docs_curriculum_order's banding):
            # quality decides the stage, per-row JVM expressions only;
            # the stage joins the shard window's partition key so
            # positions stay dense per (stage, shard)
            band = text.quality_band(F.col(args.text_col))
            docs = docs.withColumn(
                "stage",
                F.when(band == "high", 0)
                .when(band == "medium", 1)
                .otherwise(2)
                .cast("int"),
            )
        _mark("split_and_stage")
        shuffled = packing.shuffle_shards(
            docs, args.id_col, n_shards=args.shards, seed=args.seed,
            stage_col="stage" if args.curriculum else None,
        )
        _mark("shuffle_shards")
        order = F.col("shard").cast("long") * F.lit(1_000_000_000) + F.col(
            "shard_pos"
        )
        if args.curriculum:
            # stage-major total order: a trainer drains stage 0's
            # shards before stage 1 ever starts
            order = (
                F.col("stage").cast("long") * F.lit(1_000_000_000_000)
                + order
            )
        if args.bpe_merges:
            # real trained-tokenizer counts for the packing weights:
            # merges load once (rank-bounded), counting is the same
            # map-only Arrow pass scoring uses
            from realtime_data_pipeline_spark import tokenizer as _tok

            bpe_model = _tok.load_bpe(spark, args.bpe_merges)
            tok_count = _tok.bpe_token_count(
                bpe_model, F.col(args.text_col)
            )
        else:
            tok_count = text.token_count_re(F.col(args.text_col))
        weighted = shuffled.withColumn(
            "n_tokens", tok_count.cast("long")
        ).withColumn("__order", order)
        packed = packing.pack_concat_chunks(
            weighted, "__order", "n_tokens", ctx_len=args.ctx_len
        ).drop("__order")
        _mark("pack_plan")
        (
            packed.write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.out)
        )
        _mark("pack_write")
        n = spark.read.parquet(args.out).count()
        _mark("count_check")
        print(
            f"assemble: {n} docs -> {args.shards} shards "
            f"(ctx {args.ctx_len}) -> {args.out}"
        )
        import json as _json

        print(f"assemble stages: {_json.dumps(LAST_ASSEMBLE_STAGES)}")
        return 0
    if args.cmd == "synth":
        from realtime_data_pipeline_spark import pysource

        pysource.register(spark)
        df = (
            spark.read.format("synthetic_events")
            .option("n_rows", args.rows)
            .option("n_partitions", args.partitions)
            .option("n_users", args.users)
            .option("step_us", args.step_us)
            .load()
        )
        medallion.write_parquet(df, args.out, mode="overwrite")
        print(f"synth: {args.rows} rows -> {args.out}")
        return 0
    if args.cmd == "stream":
        from realtime_data_pipeline_spark import streaming

        if bool(args.schema) == bool(args.schema_from):
            raise SystemExit("stream: pass exactly one of --schema / --schema-from")
        schema = (
            args.schema
            if args.schema
            else spark.read.parquet(args.schema_from).schema
        )
        src = streaming.read_file_stream(
            spark,
            args.inbox,
            schema,
            fmt=args.format,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        sq = streaming.dq_gated_stream(
            src,
            _parse_rules(args.rule),
            args.silver,
            args.quarantine,
            checkpoint=args.checkpoint,
            curate=(
                streaming.curation_stage(
                    text_col=args.redact_text_col,
                    strip_boiler=args.strip_boilerplate,
                    id_col=args.id_col,
                )
                if args.redact_text_col
                else None
            ),
        )
        if not sq.awaitTermination(args.timeout_sec):
            sq.stop()
            print("stream: timed out before catch-up finished", file=sys.stderr)
            return 1
        n_clean = spark.read.parquet(args.silver).count()
        print(f"stream: {n_clean} clean rows -> {args.silver}")
        return 0
    if args.cmd == "ingest":
        from realtime_data_pipeline_spark import streaming

        if bool(args.schema) == bool(args.schema_from):
            raise SystemExit("ingest: pass exactly one of --schema / --schema-from")
        schema = (
            args.schema
            if args.schema
            else spark.read.parquet(args.schema_from).schema
        )
        src = streaming.read_file_stream(
            spark, args.inbox, schema, fmt=args.format,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        if args.near and args.semantic:
            raise SystemExit("ingest: --near and --semantic are exclusive")
        if args.semantic:
            sq = streaming.semdedup_ingest_stream(
                src,
                args.index,
                args.silver,
                checkpoint=args.checkpoint,
                id_col=args.id_col,
                vec_col=args.vec_col,
                threshold=args.tau,
                n_bits=args.bits,
            )
        elif args.near:
            sq = streaming.neardup_ingest_stream(
                src,
                args.index,
                args.silver,
                checkpoint=args.checkpoint,
                id_col=args.id_col,
                text_col=args.content_col,
                threshold=args.jaccard,
            )
        else:
            sq = streaming.dedup_ingest_stream(
                src,
                args.index,
                args.silver,
                checkpoint=args.checkpoint,
                content_col=args.content_col,
                id_col=args.id_col,
            )
        if not sq.awaitTermination(args.timeout_sec):
            sq.stop()
            print("ingest: timed out before catch-up finished", file=sys.stderr)
            return 1
        n = spark.read.parquet(args.silver).count()
        print(f"ingest: {n} unique docs -> {args.silver}")
        return 0
    if args.cmd == "rollup":
        from realtime_data_pipeline_spark import streaming

        if bool(args.schema) == bool(args.schema_from):
            raise SystemExit("rollup: pass exactly one of --schema / --schema-from")
        schema = (
            args.schema
            if args.schema
            else spark.read.parquet(args.schema_from).schema
        )
        hist = None
        if args.histogram:
            try:
                lo_s, hi_s, bins_s = args.histogram.split(":")
                hist = (float(lo_s), float(hi_s), int(bins_s))
            except ValueError:
                raise SystemExit(
                    "rollup: --histogram must be LO:HI:BINS, e.g. 0:1000:256"
                ) from None
        sq = streaming.continuous_rollup(
            streaming.read_file_stream(
                spark, args.inbox, schema, fmt=args.format
            ),
            args.ts_col,
            args.window,
            args.value_col,
            args.out,
            checkpoint=args.checkpoint,
            distinct_col=args.distinct_col,
            histogram=hist,
        )
        if not sq.awaitTermination(args.timeout_sec):
            sq.stop()
            print("rollup: timed out before catch-up finished", file=sys.stderr)
            return 1
        if args.compact:
            m = streaming.compact_rollup(spark, args.out)
            print(
                f"compacted {m['partitions_before']} -> "
                f"{m['partitions_after']} partial partitions"
            )
        from pyspark.sql import functions as F

        view = streaming.rollup_view(spark, args.out)
        stats = view.agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("n_events").alias("n_events"),
        ).collect()[0]
        print(
            f"rollup: {stats.n_windows} windows, "
            f"{stats.n_events} events -> {args.out}"
        )
        return 0
    if args.cmd == "maintain":
        if not (args.compact or args.retain_from or args.compact_stream_index):
            raise SystemExit(
                "maintain: pass --compact, --retain-from and/or "
                "--compact-stream-index"
            )
        if args.compact_stream_index:
            import json as _json

            from realtime_data_pipeline_spark import streaming as _streaming

            fold = {
                "fp": _streaming.compact_dedup_index,
                "neardup": _streaming.compact_neardup_index,
                "semdedup": _streaming.compact_semdedup_index,
                "fuzzy": _streaming.compact_fuzzy_index,
            }[args.compact_stream_index]
            print(_json.dumps(fold(spark, args.path)))
            if not (args.compact or args.retain_from):
                return 0
        # retention BEFORE compaction: no point rewriting files that are
        # about to be expired
        if args.retain_from:
            if not args.partition_by:
                raise SystemExit("--retain-from requires --partition-by")
            out = medallion.drop_partitions_before(
                args.path, args.partition_by, args.retain_from
            )
            print(
                f"retention: dropped {len(out['dropped'])} partitions, "
                f"kept {len(out['kept'])}"
            )
        if args.compact:
            out = medallion.compact(
                spark, args.path, partition_by=args.partition_by
            )
            print(
                f"compact: {out['files_before']} -> {out['files_after']} files "
                f"({out['rows']} rows)"
            )
        return 0
    if args.cmd == "profile":
        from realtime_data_pipeline_spark import ops

        df = medallion.read_zone(
            spark, args.path, fmt=args.format, schema=args.schema
        )
        ops.profile_table(
            df,
            columns=args.columns.split(",") if args.columns else None,
            exact_ndv=args.exact_ndv,
        ).show(1000, truncate=False)
        return 0
    if args.cmd == "drift":
        import json as _json
        import math as _math

        from pyspark.sql import functions as F

        from realtime_data_pipeline_spark import reduction

        if (args.ref is None) == (args.ref_hist is None):
            raise SystemExit("drift: exactly one of --ref / --ref-hist")
        if not (0.0 < args.ks_alpha < 1.0):
            raise SystemExit("drift: --ks-alpha must be in (0, 1)")
        cur = spark.read.parquet(args.cur)
        summary: dict = {"gates": {"psi": args.gate_psi}}
        # closed form c(alpha) = sqrt(-ln(alpha/2)/2) — matches the
        # tabulated constants (1.358/1.628/1.949 at .05/.01/.001) and
        # honours ANY requested level instead of silently falling back
        # to c(0.01) for unlisted alphas (ADVICE r15)
        c_alpha = _math.sqrt(-_math.log(args.ks_alpha / 2.0) / 2.0)

        def ks_gate(r):
            # NULL ks, or missing counts → "no evidence", like NULL t
            if getattr(r, "ks", None) is None or not r.n_ref or not r.n_cur:
                return None
            return c_alpha * (
                (r.n_ref + r.n_cur) / (r.n_ref * r.n_cur)
            ) ** 0.5

        if args.ref is not None:
            ref = spark.read.parquet(args.ref)
            if args.save_ref_hist:
                reduction.reference_histogram(
                    ref, args.save_ref_hist, vec_col=args.vec_col,
                    n_bins=args.psi_bins, lo=args.lo, hi=args.hi,
                )
                summary["saved_ref_hist"] = args.save_ref_hist
            psi = reduction.drift_psi(
                ref, cur, vec_col=args.vec_col, n_bins=args.psi_bins,
                lo=args.lo, hi=args.hi,
            )
            both = (
                psi.join(
                    reduction.drift_ttest(
                        ref, cur, vec_col=args.vec_col
                    ),
                    "dim",
                )
                .join(
                    # round-15: the distribution-free third gate — a
                    # variance/tail change with an unmoved mean inside
                    # one bin hides from BOTH psi and t, not from KS
                    reduction.drift_ks(
                        ref, cur, vec_col=args.vec_col
                    ).select("dim", "ks"),
                    "dim",
                    "left",
                )
                .orderBy("dim")
            )
            rows = both.collect()
            # NULL t (n=1 on either side for that dim → var_samp NULL)
            # is "no evidence", not "flagged" (ADVICE r13); same stance
            # for NULL ks
            flagged = sorted(
                r.dim for r in rows
                if r.psi > args.gate_psi
                or (r.t is not None and abs(r.t) > args.gate_t)
                or (
                    ks_gate(r) is not None and r.ks > ks_gate(r)
                )
            )
            summary["gates"]["t"] = args.gate_t
            summary["gates"]["ks_alpha"] = args.ks_alpha
            t_rows = [r for r in rows if r.t is not None]
            if t_rows:
                worst_t = max(t_rows, key=lambda r: abs(r.t))
                summary["worst_t"] = {"dim": worst_t.dim, "t": worst_t.t}
            ks_rows = [r for r in rows if r.ks is not None]
            if ks_rows:
                worst_ks = max(ks_rows, key=lambda r: r.ks)
                summary["worst_ks"] = {
                    "dim": worst_ks.dim, "ks": worst_ks.ks
                }
            summary["n_ref"] = rows[0].n_ref if rows else 0
            summary["n_cur"] = rows[0].n_cur if rows else 0
            both.select(
                "dim", "psi", "t", "ks",
                (F.col("psi") > args.gate_psi).alias("psi_flag"),
                (F.abs("t") > args.gate_t).alias("t_flag"),
                (
                    F.col("ks")
                    > F.lit(c_alpha)
                    * F.sqrt(
                        (F.col("n_ref") + F.col("n_cur"))
                        / (F.col("n_ref") * F.col("n_cur"))
                    )
                ).alias("ks_flag"),
            ).show(10_000, truncate=False)
        else:
            # persisted-reference mode: PSI always; Welch t too when
            # the reference carries the round-14 per-dim stats file —
            # the SAME columns the streaming monitor lands, so CLI and
            # monitor agree in both eras (pre-r14 references: PSI only)
            psi = reduction.batch_drift_psi(
                spark, cur, args.ref_hist, vec_col=args.vec_col
            )
            if reduction._reference_has_stats(spark, args.ref_hist):
                psi = psi.join(
                    reduction.batch_drift_ttest(
                        spark, cur, args.ref_hist, vec_col=args.vec_col
                    ).select("dim", "t"),
                    "dim",
                    "left",
                )
                summary["gates"]["t"] = args.gate_t
            if reduction._reference_has_sample(spark, args.ref_hist):
                # round-15: distribution-free column vs the persisted
                # d·m value sample — same column the monitor lands.
                # Keep n_ref/n_cur: the KS threshold c(alpha)*
                # sqrt((n1+n2)/(n1*n2)) needs both sample sizes, and
                # n_ref here is the persisted SAMPLE size (ADVICE r15:
                # previously dropped, leaving the ks column ungated).
                psi = psi.join(
                    reduction.batch_drift_ks_ref(
                        spark, cur, args.ref_hist, vec_col=args.vec_col
                    ).select("dim", "ks", "n_ref", "n_cur"),
                    "dim",
                    "left",
                )
                summary["gates"]["ks_alpha"] = args.ks_alpha
            psi = psi.orderBy("dim")
            rows = psi.collect()
            has_t = "t" in psi.columns
            has_ks = "ks" in psi.columns
            flagged = sorted(
                r.dim for r in rows
                if r.psi > args.gate_psi
                or (
                    has_t
                    and r.t is not None
                    and abs(r.t) > args.gate_t
                )
                or (
                    has_ks
                    and ks_gate(r) is not None
                    and r.ks > ks_gate(r)
                )
            )
            if has_t:
                t_rows = [r for r in rows if r.t is not None]
                if t_rows:
                    worst_t = max(t_rows, key=lambda r: abs(r.t))
                    summary["worst_t"] = {
                        "dim": worst_t.dim, "t": worst_t.t
                    }
            if has_ks:
                ks_rows = [r for r in rows if r.ks is not None]
                if ks_rows:
                    worst_ks = max(ks_rows, key=lambda r: r.ks)
                    summary["worst_ks"] = {
                        "dim": worst_ks.dim, "ks": worst_ks.ks
                    }
                    summary["n_ref_sample"] = worst_ks.n_ref
            summary["n_cur"] = rows[0].n_rows if rows else 0
            cols = ["dim", "psi"] + (["t"] if has_t else []) + (
                ["ks"] if has_ks else []
            )
            flags = [
                (F.col("psi") > args.gate_psi).alias("psi_flag")
            ] + (
                [(F.abs("t") > args.gate_t).alias("t_flag")]
                if has_t
                else []
            ) + (
                [
                    (
                        F.col("ks")
                        > F.lit(c_alpha)
                        * F.sqrt(
                            (F.col("n_ref") + F.col("n_cur"))
                            / (F.col("n_ref") * F.col("n_cur"))
                        )
                    ).alias("ks_flag")
                ]
                if has_ks
                else []
            )
            psi.select(*cols, *flags).show(10_000, truncate=False)
        # empty/dim-less corpora produce zero rows: emit the summary
        # with no worst_* and exit clean (nothing measured ⇒ nothing
        # flagged) instead of crashing on max() (ADVICE r13)
        if rows:
            worst_psi = max(rows, key=lambda r: r.psi)
            summary["worst_psi"] = {
                "dim": worst_psi.dim, "psi": worst_psi.psi
            }
        summary["n_dims"] = len(rows)
        summary["flagged_dims"] = flagged
        print(_json.dumps(summary))
        return 1 if flagged else 0
    if args.cmd == "scd2":
        import json as _json

        if args.action == "merge":
            if not (args.batch and args.keys and args.effective):
                raise SystemExit(
                    "scd2 merge: --batch, --keys and --effective are required"
                )
            batch = medallion.read_zone(
                spark, args.batch, fmt=args.format, schema=args.schema
            )
            out = medallion.scd2_merge(
                spark,
                args.target,
                batch,
                keys=args.keys.split(","),
                effective_col=args.effective,
                tracked=args.tracked.split(",") if args.tracked else None,
                n_buckets=args.buckets,
            )
            print(_json.dumps(out))
            return 0
        if args.action == "stream":
            from realtime_data_pipeline_spark import streaming

            if not (args.keys and args.effective and args.checkpoint):
                raise SystemExit(
                    "scd2 stream: --keys, --effective and --checkpoint "
                    "are required"
                )
            if bool(args.inbox) == bool(args.zone):
                raise SystemExit(
                    "scd2 stream: pass exactly one of --inbox / --zone"
                )
            if args.zone:
                from realtime_data_pipeline_spark import pysource

                pysource.register(spark)
                src = (
                    spark.readStream.format("zone_changes")
                    .option("root", args.zone)
                    .load()
                    .drop("_commit_version")
                )
            else:
                if not args.schema:
                    raise SystemExit("scd2 stream: --schema is required with --inbox")
                if args.format == "orc":
                    raise SystemExit(
                        "scd2 stream: --format orc is not a streaming "
                        "inbox format (use parquet/csv/json)"
                    )
                src = streaming.read_file_stream(
                    spark,
                    args.inbox,
                    args.schema,
                    fmt=args.format,
                    max_files_per_trigger=args.max_files_per_trigger,
                )
            sq = streaming.scd2_stream(
                src,
                args.target,
                keys=args.keys.split(","),
                effective_col=args.effective,
                checkpoint=args.checkpoint,
                tracked=args.tracked.split(",") if args.tracked else None,
                n_buckets=args.buckets,
            )
            if not sq.awaitTermination(args.timeout_sec):
                sq.stop()
                raise SystemExit("scd2 stream: timed out before catch-up")
            print(f"scd2 stream: dimension updated -> {args.target}")
            return 0
        if args.action == "enrich":
            from realtime_data_pipeline_spark import streaming

            missing = [
                n for n, v in (
                    ("--inbox", args.inbox), ("--schema", args.schema),
                    ("--keys", args.keys), ("--ts-col", args.ts_col),
                    ("--out", args.out), ("--checkpoint", args.checkpoint),
                ) if not v
            ]
            if missing:
                raise SystemExit(
                    f"scd2 enrich: {', '.join(missing)} required"
                )
            sq = streaming.temporal_enrich_stream(
                streaming.read_file_stream(
                    spark, args.inbox, args.schema, fmt=args.format,
                    max_files_per_trigger=args.max_files_per_trigger,
                ),
                args.target,
                keys=args.keys.split(","),
                ts_col=args.ts_col,
                out_path=args.out,
                checkpoint=args.checkpoint,
            )
            if not sq.awaitTermination(args.timeout_sec):
                sq.stop()
                raise SystemExit("scd2 enrich: timed out before catch-up")
            print(f"scd2 enrich: facts attributed -> {args.out}")
            return 0
        if args.action == "current":
            view = medallion.scd2_current(spark, args.target)
        else:
            if not args.at:
                raise SystemExit("scd2 asof: --at is required")
            view = medallion.scd2_as_of(spark, args.target, args.at)
        view.drop("__bucket").orderBy("__valid_from").show(
            args.limit, truncate=False
        )
        return 0
    if args.cmd == "replay":
        # match the zones' existing layout: a stream-produced quarantine is
        # batch_id=N partitioned, and appending flat files to a partitioned
        # silver root breaks partition discovery on the next read
        layout = (
            [args.partition_by]
            if args.partition_by
            else medallion.detect_partition_layout(args.quarantine)
        )
        out = medallion.replay_quarantine(
            spark,
            args.quarantine,
            args.silver,
            _parse_rules(args.rule),
            partition_by=layout or None,
        )
        print(
            f"replay: promoted {out['promoted']} -> {args.silver}, "
            f"{out['remaining']} remain quarantined"
        )
        return 0
    if args.cmd == "index":
        import os

        from pyspark.sql import functions as F

        batch = spark.read.parquet(args.batch)
        if args.kind == "fp":
            from realtime_data_pipeline_spark import dedup

            fresh, m = dedup.incremental_fingerprint_dedup(
                batch, args.index, args.content_col,
                tiebreak=[F.col(args.id_col).asc()],
            )
            print(
                f"fp index: {m['fresh_rows']} fresh of {m['batch_rows']} "
                f"batch rows -> {args.index}"
            )
        elif args.kind == "neardup":
            from realtime_data_pipeline_spark import neardup

            fresh, m = neardup.incremental_neardup_minhash(
                batch, args.index, args.id_col, args.content_col
            )
            print(
                f"neardup index: {m['fresh_rows']} fresh of "
                f"{m['batch_rows']} batch rows "
                f"({m['in_batch_dropped']} in-batch dups, "
                f"{m['corpus_dups']} corpus dups) -> {args.index}"
            )
        elif args.kind == "semdedup":
            from realtime_data_pipeline_spark import similarity

            fresh, m = similarity.incremental_semantic_dedup(
                batch, args.index, threshold=args.tau,
                id_col=args.id_col, vec_col=args.vec_col,
                n_bits=args.bits,
            )
            print(
                f"semdedup index: {m['fresh_rows']} fresh of "
                f"{m['batch_rows']} batch rows "
                f"({m['in_batch_dropped']} in-batch dups, "
                f"{m['corpus_dups']} corpus dups) -> {args.index}"
            )
        else:  # ivf
            from realtime_data_pipeline_spark import similarity

            fresh = None
            if os.path.exists(f"{args.index}/centroids"):
                similarity.append_to_ivf_index(
                    batch, args.index, id_col=args.id_col, vec_col=args.vec_col
                )
                print(f"ivf index: appended batch -> {args.index}")
            else:
                cents = similarity.train_centroids_kmeans(
                    batch, args.centroids,
                    id_col=args.id_col, vec_col=args.vec_col,
                )
                similarity.build_ivf_index(
                    batch, args.index, cents,
                    id_col=args.id_col, vec_col=args.vec_col,
                )
                print(
                    f"ivf index: built {args.centroids} cells -> {args.index}"
                )
        if args.fresh_out is not None:
            if fresh is None:
                raise SystemExit("--fresh-out applies to fp/neardup/semdedup only")
            medallion.write_parquet(fresh, args.fresh_out, mode="overwrite")
            print(f"fresh rows -> {args.fresh_out}")
        return 0
    if args.cmd == "pipeline":
        from realtime_data_pipeline_spark import medallion as m
        from realtime_data_pipeline_spark import orchestration

        cfg = orchestration.DailyConfig(
            source_url=args.source_url,
            zones=m.Zones(args.root),
            ts_col=args.ts_col,
            keep_cols=tuple(c.strip() for c in args.keep_cols.split(",")),
            date_col=args.date_col,
            warn_only=args.warn_only,
        )
        try:
            metrics = orchestration.run_daily(spark, cfg, _parse_rules(args.rule))
        except dq.DQCheckFailed as e:
            # per-stage logs + manifest were written before the raise —
            # point the operator at them (parity with the reference
            # runner's log-file-on-failure behavior)
            print(f"DQ gate FAILED: {e.failed_rules}", file=sys.stderr)
            print(
                f"stage logs: {cfg.zones.artifacts}/logs", file=sys.stderr
            )
            return 2
        print(f"pipeline: {metrics['bronze']['rows']} rows -> {cfg.zones.silver}")
        print(f"stage logs: {metrics['manifest']}")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
