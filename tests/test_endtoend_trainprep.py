"""End-to-end training-data preparation: the whole LLM-pipeline story
composed from the library pieces a real user would chain —

    raw corpus (exact dups + near-dups + PII planted)
      → exact content dedup            (dedup.fingerprint_dedup)
      → near-dup drop                  (neardup.neardup_pairs_minhash
                                        + dedup.drop_neardups)
      → curation: PII redaction +
        quality-band gate              (text.redact_pii / quality_band)
      → deterministic train/eval split (md5 hash split)
      → reproducible shard shuffle     (packing.shuffle_shards)
      → context-block packing manifest (packing.pack_concat_chunks)

Each stage is unit-tested elsewhere; THIS test pins that they compose —
column contracts line up, no stage resurrects what an earlier stage
dropped — and that the entire pipeline is REPLAY-DETERMINISTIC: running
it twice over a reshuffled copy of the same input yields byte-identical
final manifests (the property that makes a 100 TB prep job resumable
and auditable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark import dedup, neardup, packing, text


def _corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # plant: exact duplicates of docs 0-9, near-duplicates (every 10th
    # token prefixed) of docs 10-19, and PII in docs 20-24
    exact = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # every 20th token prefixed -> exact 3-gram Jaccard ~0.74, a regime
    # where the (64, 16) MinHash geometry's measured recall is 1.0
    # (LSH_RECALL.json); docs must be long enough to shingle at all
    mutated = F.array_join(
        F.zip_with(
            toks,
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda t, i: F.when(
                i % 20 == 0, F.concat(F.lit("zq"), t)
            ).otherwise(t),
        ),
        " ",
    )
    near = (
        docs.filter(
            (F.col("doc_id") >= 10)
            & (F.col("doc_id") < 20)
            & (F.size(toks) >= 30)
        ).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            mutated.alias("text"),
        )
    )
    # PII is planted IN PLACE on long docs (>= 60 tokens, so the quality
    # gate keeps them): appending it as near-copies would (correctly!)
    # get them dropped as near-dups of their own sources — the pipeline
    # caught exactly that in this test's first draft
    pii_docs = docs.filter(
        (F.col("doc_id") >= 20) & (F.col("doc_id") < 30) & (F.size(toks) >= 60)
    ).select("doc_id")
    docs = docs.join(F.broadcast(pii_docs.withColumn("__pii", F.lit(True))),
                     "doc_id", "left").select(
        "doc_id",
        F.when(
            F.col("__pii"),
            F.concat(
                F.col("text"),
                F.lit(" contact bob@example.com or 555-867-5309 now"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


def _run_pipeline(docs):
    # 1. exact dedup on content fingerprint (survivor = lowest doc_id)
    docs = dedup.fingerprint_dedup(docs, "text", [F.col("doc_id").asc()])
    # 2. near-dup drop via MinHash-LSH pairs, exact-verified at j>=0.5
    pairs = neardup.neardup_pairs_minhash(
        docs, "doc_id", "text", threshold=0.5
    )
    docs = dedup.drop_neardups(docs, pairs, "doc_id")
    # 3. curation: redact PII, keep medium/high-quality docs only
    docs = docs.select(
        "doc_id", text.redact_pii(F.col("text")).alias("text")
    ).filter(text.quality_band(F.col("text")).isin("medium", "high"))
    # 4. deterministic content-hash split (train ~= 13/16)
    docs = docs.withColumn(
        "split",
        F.when(
            F.substring(F.md5(F.col("text")), 1, 1) <= "c", "train"
        ).otherwise("eval"),
    )
    train = docs.filter(F.col("split") == "train")
    # 5. reproducible shard shuffle of the train set
    shuffled = packing.shuffle_shards(train, "doc_id", n_shards=4, seed=7)
    # 6. pack into 512-token context blocks in shuffle order
    weighted = shuffled.select(
        "doc_id",
        "shard",
        "shard_pos",
        text.token_count_re(F.col("text")).cast("long").alias("n_tokens"),
        # global shuffle order = (shard, shard_pos) flattened; distinct
        # ints required by the prefix sum's bucketing
        (F.col("shard").cast("long") * 1_000_000_000 + F.col("shard_pos"))
        .alias("order"),
    )
    packed = packing.pack_concat_chunks(
        weighted, "order", "n_tokens", ctx_len=512, bucket_size=64
    )
    return docs, packed.select(
        "doc_id", "shard", "shard_pos", "n_tokens",
        "offset", "start_block", "end_block",
    )


def test_trainprep_pipeline_composes_and_is_replay_deterministic(
    spark, sf_dir
):
    corpus = _corpus(spark, sf_dir)
    curated, manifest = _run_pipeline(corpus)
    rows = manifest.collect()
    assert len(rows) > 0

    # planted exact dups never survive (the original, lower id, wins)
    ids = {r.doc_id for r in rows}
    curated_ids = {r.doc_id for r in curated.collect()}
    assert not any(i >= 1_000_000 and i < 2_000_000 for i in curated_ids)
    # planted near-dups are gone too (original id < planted id)
    assert not any(i >= 2_000_000 and i < 3_000_000 for i in curated_ids)
    # PII never reaches the curated output
    leaked = curated.filter(
        F.col("text").contains("bob@example.com")
        | F.col("text").contains("555-867-5309")
    ).count()
    assert leaked == 0
    redacted = curated.filter(
        F.col("text").contains("[EMAIL]") & F.col("text").contains("[PHONE]")
    ).count()
    assert redacted > 0  # the planted-PII docs survived, scrubbed

    # the manifest is a consistent packing: in shuffle order the global
    # token offsets are the exclusive prefix sum of the token counts
    # (each doc starts exactly where the previous one ended) and every
    # doc spans a valid block range
    ordered = sorted(rows, key=lambda r: (r.shard, r.shard_pos))
    expect = 0
    for r in ordered:
        assert r.offset == expect, (r.doc_id, r.offset, expect)
        assert r.end_block >= r.start_block
        expect += r.n_tokens

    # REPLAY DETERMINISM: the same pipeline over a repartitioned copy of
    # the same input produces a byte-identical manifest
    _, manifest2 = _run_pipeline(corpus.repartition(17))
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, manifest2.collect()))
    assert a == b
