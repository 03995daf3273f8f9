"""Sequence packing (concat-and-chunk block map): DuckDB replay of the
single-node formulation + layout invariants on the production hash."""

import duckdb
import pytest

from kit_spark import plans
from kit_spark.functions.packing import pack_sequences, packing_stats

SF = "/root/testdata/sf0.001"
B = 512

ORACLE = """
WITH d AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
              '#pack-v1')), 1, 15)) AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens + 1) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS strt
  FROM d
), e AS (
  SELECT doc_id, n_tokens, strt,
         UNNEST(generate_series(strt // {b}, (strt + n_tokens - 1) // {b}))
             AS block_id
  FROM s WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, block_id,
       GREATEST(0, block_id * {b} - strt)               AS tok_begin,
       LEAST(n_tokens, (block_id + 1) * {b} - strt)     AS tok_end,
       strt + GREATEST(0, block_id * {b} - strt)
            - block_id * {b}                            AS block_off
FROM e
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return {(r["doc_id"], r["n_tokens"], r["block_id"], r["tok_begin"],
             r["tok_end"], r["block_off"]) for r in df.collect()}


def test_pack_matches_duckdb(docs):
    """The dataflow cumsum + bounded explode reproduces the naive
    single-partition SUM() OVER (ORDER BY ...) formulation exactly."""
    got = _rows(pack_sequences(docs, B, method="md5_long"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    expect = {tuple(int(v) for v in row)
              for row in con.execute(ORACLE.format(b=B)).fetchall()}
    assert got == expect
    assert len(got) > len({t[0] for t in got})  # some docs straddle blocks


def test_pack_layout_invariants_production_hash(docs):
    packed = pack_sequences(docs, B).collect()
    by_doc, by_block = {}, {}
    for r in packed:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_block.setdefault(r["block_id"], []).append(r)

    total_tokens = 0
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["block_id"])
        n = rows[0]["n_tokens"]
        total_tokens += n
        # slices partition [0, n) in consecutive blocks
        assert rows[0]["tok_begin"] == 0
        assert rows[-1]["tok_end"] == n
        for a, b in zip(rows, rows[1:]):
            assert b["block_id"] == a["block_id"] + 1
            assert b["tok_begin"] == a["tok_end"]
            assert b["block_off"] == 0  # continuation starts the block
    assert total_tokens == sum(
        rows[0]["n_tokens"] for rows in by_doc.values())

    for block_id, rows in by_block.items():
        rows.sort(key=lambda r: r["block_off"])
        pos = 0
        for r in rows:  # slices disjoint, in order, inside the block
            assert r["block_off"] >= pos >= 0
            pos = r["block_off"] + (r["tok_end"] - r["tok_begin"])
        assert pos <= B

    # deterministic: a rerun reproduces the identical layout
    again = pack_sequences(docs, B).collect()
    assert {tuple(r) for r in packed} == {tuple(r) for r in again}


def test_pack_salt_changes_layout(docs):
    a = _rows(pack_sequences(docs, B, salt="epoch-1"))
    c = _rows(pack_sequences(docs, B, salt="epoch-2"))
    assert a != c  # the salt actually re-shuffles the stream


def test_packing_stats(docs):
    packed = pack_sequences(docs, B)
    stats = packing_stats(packed, B).collect()
    assert stats
    for r in stats:
        assert 0 < r["doc_tokens"] <= B
        assert 0 < r["fill_frac"] <= 1.0
    # full interior blocks dominate: median fill is high
    fills = sorted(r["fill_frac"] for r in stats)
    assert fills[len(fills) // 2] > 0.9


def test_pack_rejects_bad_args(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, B, eos=-1)
    with pytest.raises(ValueError):
        pack_sequences(docs, B, method="sha9000")


def test_pack_plan_is_pure_catalyst(docs):
    packed = pack_sequences(docs, B)
    plan = plans.formatted_plan(packed)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    plans.assert_no_cartesian(packed)


SHARD_ORACLE = """
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
              '#shard-v1')), 1, 15)) AS BIGINT) AS h
  FROM documents
)
SELECT doc_id,
       CAST(COALESCE(SUM(n_chars) OVER (ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) // {t} AS shard_id
FROM d
"""


def test_assign_shards_matches_duckdb(docs):
    from kit_spark.functions.packing import assign_shards

    target = 10_000
    got = {(r["doc_id"], r["shard_id"]) for r in
           assign_shards(docs, target, id_col="doc_id", size_col="n_chars",
                         method="md5_long").select("doc_id", "shard_id")
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    expect = {(int(a), int(b)) for a, b in
              con.execute(SHARD_ORACLE.format(t=target)).fetchall()}
    assert got == expect


def test_assign_shards_balance_and_integrity(docs):
    from pyspark.sql import functions as F

    from kit_spark.functions.packing import assign_shards

    target = 10_000
    out = assign_shards(docs, target, id_col="doc_id", size_col="n_chars")
    # one row per input, all original columns intact, no helper columns
    assert out.count() == docs.count()
    assert set(out.columns) == set(docs.columns) | {"shard_id"}
    sizes = {r["shard_id"]: r["b"] for r in
             out.groupBy("shard_id")
             .agg(F.sum("n_chars").alias("b")).collect()}
    total = sum(sizes.values())
    # shards are contiguous 0..k and sized target +/- one max item
    max_item = max(r["n_chars"] for r in docs.collect())
    assert set(sizes) == set(range(max(sizes) + 1))
    assert abs((total - 1) // target - max(sizes)) <= 1
    for sid, b in sizes.items():
        if sid != max(sizes):  # every full shard within one item of target
            assert target - max_item <= b <= target + max_item
    with pytest.raises(ValueError):
        assign_shards(docs, 0, size_col="n_chars")


def test_pack_crafted_edges(spark):
    """Empty docs, single-token docs, and a doc spanning many blocks —
    the layout survives and still matches the naive oracle."""
    rows = [
        ("empty", ""),                       # token_count('')==1 in both
        ("single", "x"),
        ("huge", " ".join(f"w{i}" for i in range(1000))),
        ("small1", "a b c"),
        ("small2", "d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    B2 = 64
    got = _rows(pack_sequences(df, B2, method="md5_long"))
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]))
    oracle = ORACLE.replace("CAST(doc_id AS VARCHAR)", "doc_id")
    expect = {(row[0], *map(int, row[1:]))
              for row in con.execute(oracle.format(b=B2)).fetchall()}
    assert got == expect
    # the huge doc spans ceil(1000/64)+ blocks, each slice <= B2
    huge = sorted((t for t in got if t[0] == "huge"), key=lambda t: t[2])
    assert len(huge) >= 1000 // B2
    assert all(t[4] - t[3] <= B2 for t in got)
    # every doc with tokens appears; ids are strings here (generic id col)
    assert {t[0] for t in got} == {"empty", "single", "huge",
                                   "small1", "small2"}


def test_materialize_blocks_roundtrip(docs, spark):
    """Materialized blocks are all exactly block_size tokens; every doc's
    slices read back token-for-token; uncovered positions are separators."""
    from pyspark.sql import functions as F

    from kit_spark.functions.packing import materialize_blocks

    packed = pack_sequences(docs, B)
    blocks = {r["block_id"]: (r["tokens"], r["n_doc_tokens"])
              for r in materialize_blocks(packed, docs, B).collect()}
    assert all(len(t) == B for t, _ in blocks.values())

    texts = {r["doc_id"]: r["text"].strip().split()
             for r in docs.collect()}
    map_rows = packed.collect()
    for r in map_rows:  # every slice reads back exactly
        toks, _ = blocks[r["block_id"]]
        got = toks[r["block_off"]:r["block_off"]
                   + (r["tok_end"] - r["tok_begin"])]
        want = texts[r["doc_id"]][r["tok_begin"]:r["tok_end"]]
        assert got == want, (r["doc_id"], r["block_id"])

    # separators account for every uncovered position
    n_doc = sum(n for _, n in blocks.values())
    n_eos = sum(t.count("<|endoftext|>") for t, _ in blocks.values())
    assert n_doc + n_eos == len(blocks) * B
    assert n_doc == sum(r["tok_end"] - r["tok_begin"] for r in map_rows)

    # the writer plan stays Python-free
    out = materialize_blocks(packed, docs, B)
    plan = plans.formatted_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_materialize_blocks_tokenized_ids(spark):
    """The materializer consumes a real tokenizer's precomputed id
    arrays (tokens_col) the same way pack_sequences(tokens_col=...)
    consumes its counts: blocks are exact-size id arrays, every map
    slice reads back id-for-id, uncovered positions are the eos ID, and
    the plan stays Python-free."""
    from pyspark.sql import functions as F

    from kit_spark.functions.packing import materialize_blocks

    # deterministic id corpus; ids start at 1000 so eos_token=0 is
    # unambiguous in the separator count below
    rows = [(f"doc{i}",
             list(range((i + 1) * 1000, (i + 1) * 1000 + (i * 37) % 120 + 1)))
            for i in range(50)]
    df = (spark.createDataFrame(rows, "doc_id string, ids array<int>")
          .withColumn("n_ids", F.size("ids")))
    B2 = 64
    packed = pack_sequences(df, B2, tokens_col="n_ids")
    out = materialize_blocks(packed, df, B2, tokens_col="ids", eos_token=0)
    assert dict(out.dtypes)["tokens"] == "array<int>"
    blocks = {r["block_id"]: (r["tokens"], r["n_doc_tokens"])
              for r in out.collect()}
    assert all(len(t) == B2 for t, _ in blocks.values())

    ids_by_doc = {r["doc_id"]: r["ids"] for r in df.collect()}
    map_rows = packed.collect()
    for r in map_rows:  # every slice reads back exactly
        toks, _ = blocks[r["block_id"]]
        got = toks[r["block_off"]:r["block_off"]
                   + (r["tok_end"] - r["tok_begin"])]
        want = ids_by_doc[r["doc_id"]][r["tok_begin"]:r["tok_end"]]
        assert got == want, (r["doc_id"], r["block_id"])

    # eos ids account for every uncovered position
    n_doc = sum(n for _, n in blocks.values())
    n_eos = sum(t.count(0) for t, _ in blocks.values())
    assert n_doc + n_eos == len(blocks) * B2
    assert n_doc == sum(r["tok_end"] - r["tok_begin"] for r in map_rows)

    plan = plans.formatted_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_epochs(docs):
    from pyspark.sql import functions as F

    from kit_spark.functions.packing import pack_epochs

    out = pack_epochs(docs, B, n_epochs=3).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1, 2}
    # every epoch packs the whole corpus (same token total)
    totals = {e: sum(r["tok_end"] - r["tok_begin"] for r in rows)
              for e, rows in by_epoch.items()}
    assert len(set(totals.values())) == 1
    # block id ranges are disjoint and ordered by epoch
    ranges = {e: (min(r["block_id"] for r in rows),
                  max(r["block_id"] for r in rows))
              for e, rows in by_epoch.items()}
    assert ranges[0][1] < ranges[1][0] <= ranges[1][1] < ranges[2][0]
    # epochs are genuinely different shuffles
    lay0 = {(r["doc_id"], r["block_id"] - ranges[0][0]) for r in by_epoch[0]}
    lay1 = {(r["doc_id"], r["block_id"] - ranges[1][0]) for r in by_epoch[1]}
    assert lay0 != lay1
    import pytest as _pt
    with _pt.raises(ValueError):
        pack_epochs(docs, B, n_epochs=0)


def test_pack_hostile_token_counts(spark):
    """Null / negative precomputed token counts are dropped up front —
    the layout of the valid rows is unaffected by hostile neighbors."""
    rows = [("a", 5), ("b", None), ("c", -3), ("d", 7)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = pack_sequences(df, 8, tokens_col="n_tok", method="md5_long")
    by_doc = {}
    for r in got.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {"a", "d"}
    clean = pack_sequences(
        spark.createDataFrame([("a", 5), ("d", 7)],
                              "doc_id string, n_tok int"),
        8, tokens_col="n_tok", method="md5_long")
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in clean.collect()}


def test_pack_epochs_stride_survives_zero_token_tails(spark):
    """The epoch stride is arrangement-independent: with zero-token docs
    in the corpus (kept, they occupy separator positions only), no two
    epochs' block-id ranges may ever overlap regardless of where the
    hash order places the empties."""
    rows = ([(f"z{i}", 0) for i in range(40)]            # empties
            + [(f"d{i}", 13) for i in range(30)])        # real docs
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    from kit_spark.functions.packing import pack_epochs

    out = pack_epochs(df, 16, n_epochs=4, tokens_col="n_tok").collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], set()).add(r["block_id"])
    ids = sorted(by_epoch)
    for a, b in zip(ids, ids[1:]):
        assert max(by_epoch[a]) < min(by_epoch[b]), (a, b)


def test_assign_shards_hostile_sizes(spark):
    """Null/negative sizes are dropped up front; the valid rows' shard
    layout is unaffected by hostile neighbors (zero-byte rows are kept)."""
    from kit_spark.functions.packing import assign_shards

    dirty = spark.createDataFrame(
        [("a", 10), ("bad", None), ("worse", -5), ("b", 0), ("c", 7)],
        "doc_id string, sz int")
    clean = spark.createDataFrame(
        [("a", 10), ("b", 0), ("c", 7)], "doc_id string, sz int")
    got = {(r["doc_id"], r["shard_id"]) for r in
           assign_shards(dirty, 8, id_col="doc_id", size_col="sz",
                         method="md5_long").collect()}
    want = {(r["doc_id"], r["shard_id"]) for r in
            assign_shards(clean, 8, id_col="doc_id", size_col="sz",
                          method="md5_long").collect()}
    assert got == want
    assert {d for d, _ in got} == {"a", "b", "c"}


def test_pack_block_ids_exact_past_2p53(spark):
    """Block ids stay exact when cumulative stream positions exceed
    2^53 (the 10^10-doc design point with long documents): `div` on
    longs, never floor(a / b) — double division rounds the numerator to
    53 bits, and a start just below a block boundary (k*2^52 - 1) rounds
    UP across it, drifting the block id by one.  The doc sizes are
    chosen per the operator's own hash order so the second doc's start
    lands exactly on that worst case; the expectation is an exact
    Python-int oracle."""
    from kit_spark.functions.packing import (assign_shards, order_hash,
                                             pack_sequences)

    b = 1 << 52
    ids = ["d0", "d1", "d2"]
    base = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    order = {r["doc_id"]: r["h"] for r in base.select(
        "doc_id", order_hash("doc_id", "pack-v1").alias("h")).collect()}
    ordered = sorted(ids, key=lambda d: (order[d], d))
    # first doc: 3*2^52 - 2 tokens (+1 eos) => second start = 3*2^52 - 1,
    # the value double() rounds up to the block boundary 3*2^52
    sizes = {ordered[0]: 3 * b - 2, ordered[1]: 5, ordered[2]: 9}
    df = spark.createDataFrame(list(sizes.items()),
                               "doc_id string, n_tok long")
    got = {(r["doc_id"], r["n_tokens"], r["block_id"], r["tok_begin"],
            r["tok_end"], r["block_off"])
           for r in pack_sequences(df, b, tokens_col="n_tok").collect()}

    starts, s = {}, 0
    for d in ordered:
        starts[d] = s
        s += sizes[d] + 1
    assert starts[ordered[1]] == 3 * b - 1  # the crafted worst case
    expect = set()
    for d in ordered:
        st, nt = starts[d], sizes[d]
        for blk in range(st // b, (st + nt - 1) // b + 1):
            tb, te = max(0, blk * b - st), min(nt, (blk + 1) * b - st)
            expect.add((d, nt, blk, tb, te, st + tb - blk * b))
    assert got == expect

    # same arithmetic in assign_shards: the straddling row's shard is
    # the exact div of its (> 2^53) start, not the rounded double's
    sh_order = {r["doc_id"]: r["h"] for r in base.select(
        "doc_id", order_hash("doc_id", "shard-v1").alias("h")).collect()}
    sh_ordered = sorted(ids, key=lambda d: (sh_order[d], d))
    sh_sizes = {sh_ordered[0]: 3 * b - 1, sh_ordered[1]: 5, sh_ordered[2]: 9}
    sdf = spark.createDataFrame(list(sh_sizes.items()),
                                "doc_id string, sz long")
    got_sh = {r["doc_id"]: r["shard_id"] for r in
              assign_shards(sdf, b, id_col="doc_id",
                            size_col="sz").collect()}
    st = 0
    for d in sh_ordered:
        assert got_sh[d] == st // b, d
        st += sh_sizes[d]


def test_materialize_blocks_rejects_uncastable_eos(spark):
    """A separator that cannot represent the token element type must fail
    fast: the silent alternative casts to NULL and fills every separator
    and padding position with nulls (ADVICE r5)."""
    import pytest
    from pyspark.sql import functions as F

    from kit_spark.functions.packing import materialize_blocks, pack_sequences

    docs = spark.createDataFrame(
        [(1, [5, 6, 7]), (2, [8, 9])], "doc_id long, ids array<int>") \
        .withColumn("n", F.size("ids"))
    packed = pack_sequences(docs, 4, tokens_col="n")
    with pytest.raises(TypeError, match="eos_token"):
        materialize_blocks(packed, docs, 4, tokens_col="ids")  # default str
    out = materialize_blocks(packed, docs, 4, tokens_col="ids", eos_token=0)
    rows = out.collect()
    assert all(len(r["tokens"]) == 4 for r in rows)
    assert all(t is not None for r in rows for t in r["tokens"])
