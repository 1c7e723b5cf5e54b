"""Trained BPE tokenizer (tokenizer.py): textbook-example merges,
determinism across partition layouts, monotone compression, greedy
rank-order apply, OOV pass-through, model persistence, Arrow-not-row
plan."""

from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import tokenizer


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic BPE teaching corpus shape: shared prefixes dominate
    rows = (
        [("low low low low low",)] * 2
        + [("lower lower newest newest newest",)] * 3
        + [("newest widest widest",)] * 2
    )
    return spark.createDataFrame(pd.DataFrame(rows, columns=["text"]))


def test_textbook_merges_learned_in_frequency_order(corpus):
    model = tokenizer.train_bpe(corpus, "text", n_merges=4)
    # word counts: low 10, lower 6, newest 11, widest 4
    assert model["n_merges"] == 4
    # ('w','e'): lower 6 + newest 11 = 17 — the clear winner; then
    # ('l','o'): low 10 + lower 6 = 16; then ('s','t'): newest 11 +
    # widest 4 = 15 (the 'e','s' pair was consumed by the 'we' merge)
    assert model["merges"][:3] == [("w", "e"), ("l", "o"), ("s", "t")]


def test_training_layout_invariant_and_deterministic(corpus):
    a = tokenizer.train_bpe(corpus.coalesce(1), "text", n_merges=6)
    b = tokenizer.train_bpe(corpus.repartition(7), "text", n_merges=6)
    assert a["merges"] == b["merges"]


def test_more_merges_never_increase_token_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    counts = []
    for n in (0, 20, 80):
        model = tokenizer.train_bpe(docs, "text", n_merges=n)
        total = docs.select(
            F.sum(tokenizer.bpe_token_count(model, F.col("text"))).alias("t")
        ).first()["t"]
        counts.append(total)
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] < counts[0]  # merges actually compress


def test_greedy_apply_honors_rank_order_and_oov(corpus):
    model = tokenizer.train_bpe(corpus, "text", n_merges=8)
    enc = tokenizer.bpe_encode_udf(model)
    df = corpus.sparkSession.createDataFrame(
        pd.DataFrame({"text": ["newest", "zzz±qq", None, ""]})
    ).withColumn("toks", enc(F.col("text")))
    got = [r.toks for r in df.collect()]
    assert "".join(got[0]) == "newest"  # lossless concatenation
    assert len(got[0]) < len("newest")  # compressed
    assert "".join(got[1]) == "zzz±qq"  # unseen chars pass through
    assert got[2] == [] and got[3] == []


def test_model_roundtrip_encodes_identically(spark, corpus, tmp_path):
    model = tokenizer.train_bpe(corpus, "text", n_merges=6)
    path = str(tmp_path / "bpe")
    tokenizer.save_bpe(spark, model, path)
    back = tokenizer.load_bpe(spark, path)
    assert back["merges"] == model["merges"]
    a = corpus.select(
        tokenizer.bpe_encode_udf(model)(F.col("text")).alias("t")
    ).collect()
    b = corpus.select(
        tokenizer.bpe_encode_udf(back)(F.col("text")).alias("t")
    ).collect()
    assert [r.t for r in a] == [r.t for r in b]


def test_encode_is_arrow_batched_map_only(corpus):
    model = tokenizer.train_bpe(corpus, "text", n_merges=4)
    plan = plan_str(
        corpus.select(tokenizer.bpe_encode_udf(model)(F.col("text")))
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_face_runs_with_stable_stats(spark, sf_dir):
    from realtime_data_pipeline_spark.queries.llm import docs_bpe_stats

    out = docs_bpe_stats(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert {"doc_id", "n_bpe_tokens", "n_ws_tokens", "compression"} <= set(
        out.columns
    )
    for r in rows:
        assert 0 < r.n_bpe_tokens
        # BPE on whitespace words can never produce FEWER than 1 token
        # per word, and merges only shrink within-word counts
        assert r.n_bpe_tokens >= r.n_ws_tokens


def test_cli_assemble_packs_with_bpe_counts(spark, tmp_path):
    """assemble --bpe-merges: packing weights come from the trained
    tokenizer; since BPE merges compress within-word tokens, the packed
    n_tokens must be <= the regex-proxy run's for every doc, and the
    manifest stays replay-deterministic."""
    from realtime_data_pipeline_spark import cli

    docs = str(tmp_path / "docs")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.select("doc_id", "text").limit(80).write.parquet(docs)

    model = tokenizer.train_bpe(spark.read.parquet(docs), "text", n_merges=60)
    mpath = str(tmp_path / "merges")
    tokenizer.save_bpe(spark, model, mpath)

    def run(out, *extra):
        rc = cli.main(
            ["assemble", "--docs", docs, "--out", out, "--shards", "2",
             "--ctx-len", "256", "--split", "all", *extra]
        )
        assert rc == 0
        return {
            r.doc_id: r.n_tokens
            for r in spark.read.parquet(out).select("doc_id", "n_tokens").collect()
        }

    bpe1 = run(str(tmp_path / "o_bpe"), "--bpe-merges", mpath)
    bpe2 = run(str(tmp_path / "o_bpe2"), "--bpe-merges", mpath)
    assert bpe1 == bpe2  # deterministic replay
    regex = run(str(tmp_path / "o_re"))
    assert set(bpe1) == set(regex)
    # whitespace-word BPE counts >= word count but are REAL sub-word
    # counts; vs the regex [a-z0-9]+ proxy they may differ either way —
    # what matters is they are positive and model-determined
    assert all(v > 0 for v in bpe1.values())
    assert bpe1 != regex  # the knob actually changes the weights
