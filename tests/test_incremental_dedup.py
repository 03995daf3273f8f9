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


def _generates_semi_bounded(plan: str) -> tuple[int, int]:
    """(n_generates, n_generates_with_a_LeftSemi_below) from the tree
    section of a formatted plan: for each Generate line, scan the deeper-
    indented lines beneath it for a LeftSemi join."""
    tree = plan.split("\n\n")[0].splitlines()
    def indent(line):
        return len(line) - len(line.lstrip(" :+-*"))
    total = bounded = 0
    for i, line in enumerate(tree):
        if "Generate" not in line:
            continue
        total += 1
        base = indent(line)
        for below in tree[i + 1:]:
            if indent(below) <= base:
                break
            if "LeftSemi" in below:
                bounded += 1
                break
    return total, bounded


def test_verify_restricted_to_pairs_is_candidate_bounded(spark):
    """The O(batch) contract of the incremental verify (round-6 fix): with
    restrict_to_pairs=True the shingle explode's input is semi-joined to
    the candidate-pair ids, so verify cost tracks the candidate set, not
    the corpus — and the result is unchanged."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = spark.createDataFrame(
        [(3, 17), (17, 250), (41, 42)], "a long, b long")

    base = DD.ngram_jaccard_pairs(docs, pairs, n=3)
    restricted = DD.ngram_jaccard_pairs(docs, pairs, n=3,
                                        restrict_to_pairs=True)
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, restricted.collect()))

    # plan lock: EVERY shingle explode sits above the candidate-id semi
    # join (the explode input is pair-bounded), and none does without it
    total, bounded = _generates_semi_bounded(plans.formatted_plan(restricted))
    assert total >= 1 and bounded == total, (total, bounded)
    t_un, b_un = _generates_semi_bounded(plans.formatted_plan(base))
    assert b_un == 0, "unrestricted form unexpectedly semi-joins"


def _index_scan_exchange_free(plan: str, table: str) -> bool:
    """True when the scan of ``table`` reaches its enclosing join with no
    Exchange on the path (walk ancestors by indentation in the tree)."""
    tree = plan.split("\n\n")[0].splitlines()

    def indent(line):
        return len(line) - len(line.lstrip(" :+-*"))

    scan_at = next(i for i, line in enumerate(tree) if "Scan" in line
                   and table in line)
    limit = indent(tree[scan_at])
    for i in range(scan_at - 1, 0, -1):
        if indent(tree[i]) >= limit:
            continue  # not an ancestor
        limit = indent(tree[i])
        if "Join" in tree[i]:
            return True
        if "Exchange" in tree[i]:
            return False
    return False


def test_bucketed_band_index_probe_is_exchange_free(spark, tmp_path):
    """The bucketed-state claim of the incremental docstrings, exercised:
    with the band index persisted bucketed on (band, val), the probe's
    index-side join leg runs off the bucketed scan with NO exchange of
    the index — even when the batch side cannot broadcast — and the
    pairs equal the plain-parquet path exactly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 400)
    sig_old = DD.minhash_signatures(old, k=8, n=3, method="md5_long")
    sig_new = DD.minhash_signatures(new, k=8, n=3, method="md5_long")

    plain = {(r["a"], r["b"]) for r in DD.lsh_incremental_pairs(
        sig_new, DD.lsh_band_index(sig_old)).collect()}

    DD.write_band_index_bucketed(DD.lsh_band_index(sig_old),
                                 "band_index_bucketed_test", buckets=8,
                                 path=str(tmp_path / "bidx"))
    try:
        idx = spark.table("band_index_bucketed_test")
        threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = DD.lsh_incremental_pairs(sig_new, idx)
            plan = plans.formatted_plan(out)
            assert "SelectedBucketsCount" in plan, plan[:3000]
            assert _index_scan_exchange_free(
                plan, "band_index_bucketed_test"), plan[:3000]
            assert {(r["a"], r["b"]) for r in out.collect()} == plain
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index_bucketed_test")
