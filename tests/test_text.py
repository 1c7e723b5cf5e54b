"""Unit tests for text.py PII regexes — cases the oracle comparison can
NOT catch, because both engines run the same pattern: these pin the
*intended* behavior and assert Spark (Java regex) and DuckDB (RE2) agree
on it (round-3 advisory: the phone pattern lacked a leading boundary and
partially redacted the tail of longer digit runs)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import text

PHONE_CASES = [
    # (input, expected after redact_pii)
    ("call 555-867-1234 now", "call [PHONE] now"),
    # digit run longer on the LEFT: must not partially redact the tail
    ("id 6555-867-1234", "id 6555-867-1234"),
    # digit run longer on the RIGHT: trailing \b blocks it
    ("id 555-867-12345", "id 555-867-12345"),
    # leading + is part of the number
    ("+555-867-1234", "[PHONE]"),
    ("dot 555.867.1234 sep", "dot [PHONE] sep"),
    # letters glued to the digits = identifier, not a phone
    ("sku x555-867-1234", "sku x555-867-1234"),
]


@pytest.mark.parametrize("raw,expected", PHONE_CASES)
def test_phone_redaction_boundaries(spark, raw, expected):
    got = (
        spark.createDataFrame([(raw,)], "s string")
        .select(text.redact_pii(F.col("s")).alias("r"))
        .first()["r"]
    )
    assert got == expected


@pytest.mark.parametrize("raw,expected", PHONE_CASES)
def test_phone_redaction_duckdb_parity(raw, expected):
    """RE2 must make the same call as Java regex on every boundary case,
    or the docs_pii_redaction oracle is comparing two different operators."""
    got = duckdb.sql(
        "SELECT regexp_replace(?, ?, '[PHONE]', 'g')",
        params=[raw, text.PII_PHONE_RE],
    ).fetchone()[0]
    assert got == expected


def test_strip_boilerplate_cleans_shared_spans(spark):
    """Span-removal semantics: corpus-repeated 5-gram runs are stripped,
    per-doc unique content survives, untouched docs stay BYTE-identical
    (whitespace included), a fully-boilerplate doc collapses to '' and
    NULL text passes through."""
    hdr = "copyright acme corp all rights reserved"
    rows = [
        (i, f"{hdr} body{i}a body{i}b body{i}c body{i}d body{i}e")
        for i in range(3)
    ]
    rows += [
        (7, "an untouched  doc   with odd   spacing kept byte identical"),
        (8, hdr),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in text.strip_boilerplate(df).collect()
    }
    for i in range(3):
        assert got[i] == f"body{i}a body{i}b body{i}c body{i}d body{i}e"
    assert got[7] == "an untouched  doc   with odd   spacing kept byte identical"
    assert got[8] == ""  # nothing but the shared header
    assert got[9] is None


def test_strip_boilerplate_keeps_schema_and_other_columns(spark):
    """Only text_col is rewritten; sibling columns ride through."""
    hdr = "one two three four five six"
    df = spark.createDataFrame(
        [(i, f"{hdr} tail{i}x tail{i}y", f"src{i}") for i in range(3)],
        "doc_id long, text string, source string",
    )
    out = text.strip_boilerplate(df)
    assert out.columns == ["doc_id", "text", "source"]
    got = {r.doc_id: (r.text, r.source) for r in out.collect()}
    assert got[1] == ("tail1x tail1y", "src1")


def test_strip_boilerplate_survives_colliding_and_prefixed_columns(spark):
    """Working columns are derived from a prefix checked against the
    caller's frame: inputs already carrying __sb_-style or legacy __grams/
    __starts/__covered names neither collide (ambiguous-column error) nor
    corrupt spans."""
    hdr = "one two three four five six"
    df = spark.createDataFrame(
        [
            (i, f"{hdr} tail{i}x tail{i}y", "x", [1], "y")
            for i in range(3)
        ],
        "doc_id long, text string, __grams string, "
        "__sb_toks array<int>, __starts string",
    )
    out = text.strip_boilerplate(df)
    assert out.columns == ["doc_id", "text", "__grams", "__sb_toks", "__starts"]
    got = {
        r["doc_id"]: (r["text"], r["__grams"], r["__starts"])
        for r in out.collect()
    }
    assert got[1] == ("tail1x tail1y", "x", "y")


def test_strip_boilerplate_single_tokenization_plan(spark):
    """The staged (tokens, gram-hashes) frame is persisted so detect and
    rebuild share ONE corpus materialization — the physical plan must show
    an InMemoryTableScan (cache reuse), and exactly one Project may carry
    the split() tokenizer."""
    hdr = "one two three four five six"
    df = spark.createDataFrame(
        [(i, f"{hdr} tail{i}x tail{i}y") for i in range(3)],
        "doc_id long, text string",
    )
    out = text.strip_boilerplate(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_strip_boilerplate_as_exact_substring_dedup(spark):
    """The Lee-et-al-2022 'deduplicating training data' shape — remove
    EXACT substrings of >= N tokens repeated anywhere in the corpus — is
    strip_boilerplate parametrically: n = the minimum run length,
    min_df = 2 (repeated in any two docs). A 20-token passage pasted
    into two otherwise-different documents is excised from BOTH (runs
    of overlapping flagged n-grams merge via the covered-index union),
    while each doc's unique prose survives and singleton docs stay
    byte-identical."""
    passage = " ".join(f"boiler{i}" for i in range(20))
    rows = [
        (1, f"alpha one two three {passage} tail1a tail1b"),
        (2, f"{passage} beta four five six tail2a"),
        (3, "gamma unique text with no repeated passage at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in text.strip_boilerplate(df, n=20, min_df=2).collect()
    }
    assert got[1] == "alpha one two three tail1a tail1b"
    assert got[2] == "beta four five six tail2a"
    assert got[3] == rows[2][1]


def test_strip_contaminated_excises_eval_shared_spans(spark):
    """A >=5-token passage shared with any eval doc is removed from the
    train doc (every overlapping occurrence), clean train docs stay
    byte-identical, and eval docs are never modified (they are only the
    doomed-gram source)."""
    from realtime_data_pipeline_spark import text as T

    leak = "the quick brown fox jumps over lazy dogs"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words here {leak} trailing tail"),
            (2, "completely clean document with original content only"),
            (3, f"{leak}"),  # doc that IS the leak: strips to empty
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, f"benchmark question {leak} answer key")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in T.strip_contaminated(train, evals).collect()
    }
    assert "quick brown fox" not in out[1]
    assert out[1].startswith("intro words here")
    assert out[1].endswith("trailing tail")
    assert out[2] == "completely clean document with original content only"
    assert out[3] == ""
