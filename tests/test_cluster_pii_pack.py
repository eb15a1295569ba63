"""Tests for round-5 pipeline ops: connected-components dedup groups,
PII detection/redaction, concat-and-chunk token offsets."""

import pytest
from pyspark.sql import functions as F, types as T

from goskema_spark.ops.cluster import connected_components, dedup_groups
from goskema_spark.ops.pack import chunk_assignments
from goskema_spark.ops.pii import pii_profile, redact_pii


def _pairs(spark, rows):
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
    ]))


# ---------------------------------------------------------------- cluster

def test_cc_transitive_chain(spark):
    # 1-2, 2-3, 3-4 is ONE component (diameter 3: needs real propagation,
    # not just the neighbor-min seed); 10-11 a second; either pair
    # orientation accepted
    p = _pairs(spark, [(2, 1), (2, 3), (3, 4), (11, 10)])
    got = {r["node"]: r["group_id"]
           for r in connected_components(p).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_two_chains_merge(spark):
    # two long chains joined at one end — exercises multi-round merging
    chain = [(i, i + 1) for i in range(1, 5)] + [(i, i + 1) for i in range(20, 24)]
    bridge = [(5, 24)]
    got = {r["node"]: r["group_id"]
           for r in connected_components(_pairs(spark, chain + bridge)).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 10


def test_cc_max_iter_raises(spark):
    p = _pairs(spark, [(i, i + 1) for i in range(1, 30)])
    with pytest.raises(RuntimeError, match="convergence"):
        connected_components(p, max_iter=2)


def test_cc_returns_no_cachemanager_entry(spark):
    """r6: the returned (final) generation must not be registered with
    the SQL CacheManager — a persist()'d return value would pin an
    O(nodes) cache for the whole session, since no caller ever
    unpersists it. The ContextCleaner-managed localCheckpoint the
    function returns instead reports StorageLevel NONE here (the
    CacheManager has no entry for a LogicalRDD plan)."""
    from pyspark import StorageLevel
    p = _pairs(spark, [(2, 1), (2, 3), (3, 4), (11, 10)])
    out = connected_components(p)
    assert out.count() == 6
    assert out.storageLevel == StorageLevel.NONE


def test_dedup_groups_keep_flag(spark):
    p = _pairs(spark, [(5, 9), (9, 7)])
    rows = {r["doc_id"]: r for r in dedup_groups(p).collect()}
    assert rows[5]["keep"] and rows[5]["group_id"] == 5
    assert not rows[7]["keep"] and rows[7]["group_id"] == 5
    assert not rows[9]["keep"]


# -------------------------------------------------------------------- pii

def _pii_docs(spark):
    rows = [
        (1, "contact me at bob.smith+spam@example.co.uk for details"),
        (2, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
        (3, "call 555-123-4567 or +1 555 123 4567"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "perfectly clean text with no identifiers at all"),
        (6, None),
    ]
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]))


def test_pii_counts_and_flag(spark):
    got = {r["doc_id"]: r for r in pii_profile(_pii_docs(spark)).collect()}
    assert got[1]["n_email"] == 1 and got[1]["has_pii"]
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_phone"] >= 1
    assert got[4]["n_ssn"] == 1
    assert got[5]["has_pii"] is False
    assert got[6]["has_pii"] is None  # null text stays null, not flagged


def test_pii_redaction(spark):
    got = {r["doc_id"]: r["text_redacted"]
           for r in pii_profile(_pii_docs(spark)).collect()}
    assert got[1] == "contact me at <EMAIL> for details"
    assert got[2] == "server at <IPV4> and <IPV4> rebooted"
    assert "<SSN>" in got[4]
    # email must win over the phone-ish digit runs inside it
    assert "@" not in got[1]
    # clean text passes through untouched
    assert got[5] == "perfectly clean text with no identifiers at all"


def test_redact_is_idempotent(spark):
    df = _pii_docs(spark).filter("text is not null")
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert [r["t"] for r in once.collect()] == [r["t"] for r in twice.collect()]


# ------------------------------------------------------------------- pack

def _tok_docs(spark, n=50):
    # doc i in source src{i%3} with i%7+1 tokens
    rows = [(i, f"src{i % 3}", " ".join(["w"] * (i % 7 + 1)))
            for i in range(n)]
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]))


def _expected_offsets(n=50):
    docs = sorted(((f"src{i % 3}", i, i % 7 + 1) for i in range(n)))
    out, acc = {}, 0
    for src, i, ntok in docs:
        out[i] = (ntok, acc)
        acc += ntok
    return out


def test_chunk_offsets_match_serial(spark):
    got = {r["doc_id"]: r for r in
           chunk_assignments(_tok_docs(spark), chunk_tokens=16).collect()}
    exp = _expected_offsets()
    for i, (ntok, off) in exp.items():
        assert got[i]["n_tok"] == ntok
        assert got[i]["tok_offset"] == off, f"doc {i}"
        assert got[i]["first_chunk"] == off // 16
        assert got[i]["last_chunk"] == (off + ntok - 1) // 16


def test_chunk_offsets_invariant_to_partitioning(spark):
    a = chunk_assignments(_tok_docs(spark), 16, num_parts=1).collect()
    b = chunk_assignments(
        _tok_docs(spark).repartition(7), 16, num_parts=5).collect()
    key = lambda r: (r["source"], r["doc_id"])
    assert {key(r): r["tok_offset"] for r in a} == \
           {key(r): r["tok_offset"] for r in b}


def test_chunk_straddle(spark):
    # one 10-token doc then one 10-token doc with chunk=8: second doc
    # starts at offset 10 -> chunks 1..2; first straddles 0..1
    rows = [(1, "s", " ".join(["w"] * 10)), (2, "s", " ".join(["w"] * 10))]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r for r in chunk_assignments(df, 8).collect()}
    assert (got[1]["first_chunk"], got[1]["last_chunk"]) == (0, 1)
    assert (got[2]["first_chunk"], got[2]["last_chunk"]) == (1, 2)


def test_chunk_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        chunk_assignments(_tok_docs(spark), 0)


def test_chunk_offsets_parquet_scratch_matches_checkpoint(spark, tmp_path):
    """r6 (VERDICT r5 #3): the durable parquet-scratch pin must produce
    byte-identical offsets to the localCheckpoint pin, for any
    partitioning — the read-back re-groups by the stored _pid, so the
    scan's own file splitting cannot change the result."""
    docs = _tok_docs(spark)
    want = sorted((r["doc_id"], r["tok_offset"], r["first_chunk"], r["last_chunk"])
                  for r in chunk_assignments(docs, 16).collect())
    for parts in (1, 3, 7):
        got = sorted(
            (r["doc_id"], r["tok_offset"], r["first_chunk"], r["last_chunk"])
            for r in chunk_assignments(
                docs.repartition(parts), 16, num_parts=parts,
                scratch_path=str(tmp_path / f"scratch_{parts}"),
                scratch_min_parts=0).collect())
        assert got == want, f"num_parts={parts}"
