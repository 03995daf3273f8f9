"""Incremental LSH dedup: a new batch probed against the persisted band
index reproduces exactly the full-batch pairs that involve a new doc."""

from pyspark.sql import functions as F

from kit_spark import plans
from kit_spark.functions import dedup as DD

SF = "/root/testdata/sf0.001"


def test_incremental_equals_batch_restriction(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)

    sig_old = DD.minhash_signatures(old, k=8, n=3, method="md5_long")
    sig_new = DD.minhash_signatures(new, k=8, n=3, method="md5_long")
    sig_all = DD.minhash_signatures(docs, k=8, n=3, method="md5_long")

    # the index round-trips through parquet like a real corpus table
    idx_path = str(tmp_path / "band_index")
    DD.lsh_band_index(sig_old).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    incr = {(r["a"], r["b"]) for r in
            DD.lsh_incremental_pairs(sig_new, index).collect()}
    full = {(r["a"], r["b"]) for r in
            DD.lsh_candidate_pairs(sig_all).collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = {(a, b) for a, b in full if a in new_ids or b in new_ids}
    assert incr == expected
    assert incr  # the split actually produces cross-batch candidates

    # batch == old-only pairs + increment: nothing lost, nothing invented
    old_pairs = {(r["a"], r["b"]) for r in
                 DD.lsh_candidate_pairs(sig_old).collect()}
    assert old_pairs | incr == full
    assert old_pairs.isdisjoint(incr)

    out = DD.lsh_incremental_pairs(sig_new, index)
    plan = plans.formatted_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plans.assert_no_cartesian(out)


def test_incremental_reingest_is_idempotent(spark):
    """A doc_id present in BOTH the index and the new batch: its stale
    index rows are dropped (the batch signature wins), so it never pairs
    with its own prior version, duplicate band rows never inflate bucket
    counts under max_bucket, and the result equals the disjoint-batch
    restriction exactly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    # the new batch re-ingests 50 old docs alongside the genuinely new
    new = docs.where(F.col("doc_id") >= 350)
    sig_old = DD.minhash_signatures(old, k=8, n=3, method="md5_long")
    sig_new = DD.minhash_signatures(new, k=8, n=3, method="md5_long")
    sig_all = DD.minhash_signatures(docs, k=8, n=3, method="md5_long")
    index = DD.lsh_band_index(sig_old)

    for cap in (None, 3):
        incr = {(r["a"], r["b"]) for r in DD.lsh_incremental_pairs(
            sig_new, index, max_bucket=cap).collect()}
        full = {(r["a"], r["b"]) for r in
                DD.lsh_candidate_pairs(sig_all, max_bucket=cap).collect()}
        new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
        expected = {(a, b) for a, b in full
                    if a in new_ids or b in new_ids}
        assert incr == expected, f"cap={cap}"
        # no self-pairs from the doc's own stale index rows
        assert all(a != b for a, b in incr)


def test_incremental_cap_matches_batch_cap(spark):
    """max_bucket applies to the COMBINED bucket, so a capped increment
    mirrors the capped batch restriction."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)
    sig_old = DD.minhash_signatures(old, k=8, n=3, method="md5_long")
    sig_new = DD.minhash_signatures(new, k=8, n=3, method="md5_long")
    sig_all = DD.minhash_signatures(docs, k=8, n=3, method="md5_long")
    cap = 3
    incr = {(r["a"], r["b"]) for r in DD.lsh_incremental_pairs(
        sig_new, DD.lsh_band_index(sig_old), max_bucket=cap).collect()}
    full = {(r["a"], r["b"]) for r in
            DD.lsh_candidate_pairs(sig_all, max_bucket=cap).collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert incr == {(a, b) for a, b in full if a in new_ids or b in new_ids}
