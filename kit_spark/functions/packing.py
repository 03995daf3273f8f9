"""Sequence packing: concat-and-chunk assembly of fixed-length training
blocks from variable-length documents.

The layout every GPT-style pretraining pipeline performs (Radford et al.
2019; Brown et al. 2020; The Pile): documents are concatenated on one
virtual token stream in a deterministic pseudo-random order (a stable
hash of the id — a shuffle that survives re-runs), each followed by
``eos`` separator tokens, and the stream is chunked into blocks of
exactly ``block_size`` tokens.  A document that straddles a boundary is
split, not padded — packing wastes zero tokens.

:func:`pack_sequences` emits the block map: one row per (document,
block) intersection with intra-document and intra-block offsets, so a
downstream tokenizer/writer can materialize block files with no further
shuffle — every row already carries which slice of which doc lands where.
Stream positions inside a block not covered by any slice are the
separator tokens (and, in the final block, padding) by construction.

Scale shape (the 10^10-doc question):

* the global exclusive running sum of token counts uses the
  ``global_sequence`` dataflow (operators/frontier.py): one
  range-repartition on the order hash, per-partition window, then a
  #partitions-row running-sum broadcast back — **no driver collect and
  no single-partition window at any scale** (a naive
  ``SUM() OVER (ORDER BY h)`` would serialize the corpus through one
  task; the oracle test replays exactly that form in DuckDB, where
  single-node is fine).
* the span explode is bounded: a doc crossing k boundaries emits k+1
  rows, so total output rows = n_docs + n_blocks - 1 at most — linear,
  never quadratic.
* everything else is arithmetic on longs inside codegen; no Python.

:func:`assign_shards` is the multimodal sibling: WebDataset-style
byte-balanced output sharding for image+caption rows (items never split
across shards), built on the same cumsum dataflow with no explode.

Hash families follow the repo convention (functions/dedup.py):
``xxhash64`` is the production order, ``md5_long`` the DuckDB-replayable
twin used by the oracle tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .. import lifecycle
from .dedup import md5_long
from .text import token_count


def order_hash(id_col: str, salt: str, method: str = "xxhash64") -> Column:
    """Stable pseudo-shuffle key from (id, salt) — the document order on
    the virtual stream.  Salted so independent packings of the same
    corpus (different epochs/releases) decorrelate."""
    keyed = F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))
    if method == "xxhash64":
        return F.xxhash64(keyed)
    if method == "md5_long":
        return md5_long(keyed)
    raise ValueError(f"unknown hash method {method!r}")


def global_excl_cumsum(df: DataFrame, order_cols: list,
                       need_col: str = "__need",
                       out_col: str = "__start",
                       partitions: int | None = None) -> DataFrame:
    """Exclusive global running sum of ``need_col`` over the total order
    ``order_cols``, added as ``out_col`` — the ONE scalable global-
    cumsum dataflow in the repo: range partition on the order key,
    per-partition window, then a #partitions-row running-sum offsets
    table broadcast back.  No driver collect and no single-partition
    window at any scale.  ``operators.frontier.global_sequence`` is the
    ``need == 1`` specialization (a 0-based sequence IS the exclusive
    cumsum of ones); packing/sharding sum token/byte widths.

    Both persists ride the entry-scoped lifecycle (kit_spark/lifecycle.py):
    the input cache guards ``repartitionByRange``'s boundary-sampling job
    from recomputing upstream, and ``local`` is shared by the offsets
    pass and the caller's action.  No eager ``count()`` materialization:
    the caller's single action drives the whole dataflow (the broadcast
    offsets stage populates ``local``'s cache first; concurrent stage
    materialization is safe because RDD block computation takes
    per-partition locks, so a second reader waits instead of
    recomputing), which saves one full job per cumsum."""
    spark = df.sparkSession
    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)
    df = lifecycle.track(df)
    ranged = (df.repartitionByRange(partitions, *order_cols)
              .withColumn("__pid", F.spark_partition_id()))
    local_w = (W.partitionBy("__pid").orderBy(*order_cols)
               .rowsBetween(W.unboundedPreceding, -1))
    local = lifecycle.track(ranged.withColumn(
        "__lstart", F.coalesce(F.sum(need_col).over(local_w), F.lit(0))))
    sums = local.groupBy("__pid").agg(F.sum(need_col).alias("__s"))
    cum_w = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offs = sums.select(
        "__pid", F.coalesce(F.sum("__s").over(cum_w), F.lit(0)).alias("__off"))
    return (local.join(F.broadcast(offs), "__pid")
            .withColumn(out_col,
                        (F.col("__off") + F.col("__lstart")).cast("long"))
            .drop("__pid", "__lstart", "__off"))


def _global_excl_cumsum(base: DataFrame, id_col: str,
                        partitions: int) -> DataFrame:
    """Packing's specialization: cumsum of ``__need`` over (__h, id)."""
    return global_excl_cumsum(base, ["__h", id_col],
                              partitions=partitions)


def pack_sequences(df: DataFrame, block_size: int, id_col: str = "doc_id",
                   text_col: str = "text", tokens_col: str | None = None,
                   eos: int = 1, salt: str = "pack-v1",
                   method: str = "xxhash64",
                   partitions: int | None = None) -> DataFrame:
    """Block map of the concat-and-chunk packing.

    Returns one row per (doc, block) intersection::

        doc_id, n_tokens,          -- the doc and its total token count
        block_id,                  -- 0-based block on the stream
        tok_begin, tok_end,        -- the doc slice in this block [begin, end)
        block_off                  -- where the slice starts inside the block

    ``tokens_col`` supplies a precomputed per-doc token count; otherwise
    whitespace ``token_count(text_col)`` is used (swap in
    ``regex_token_count`` upstream for BPE granularity — packing only
    needs a count column).  Docs with zero tokens occupy separator
    positions only and emit no rows.  Deterministic in (ids, salt):
    re-runs, retries, and repartitionings reproduce the identical layout.
    """
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    if eos < 0:
        raise ValueError(f"eos must be >= 0, got {eos}")
    spark = df.sparkSession
    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)

    n = (F.col(tokens_col) if tokens_col else token_count(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        order_hash(id_col, salt, method).alias("__h"),
    )
    # a null or negative count (possible only via a caller's tokens_col)
    # would silently corrupt every later start offset — drop such rows
    # up front so the layout is a total function of the valid rows
    base = (base.where(F.col("n_tokens").isNotNull()
                       & (F.col("n_tokens") >= 0))
            .withColumn("__need", F.col("n_tokens") + F.lit(int(eos))))
    staged = _global_excl_cumsum(base, id_col, partitions)

    # bounded span explode: blocks overlapping the doc's own tokens
    # [start, start + n) — separator positions are implied by the gaps.
    # block ids via long `div`, NOT floor(a / b): `/` on longs is double
    # division, which loses integer precision past 2^53 total stream
    # tokens — reachable at the 10^10-doc design point — and would
    # silently drift block boundaries there
    b = F.lit(int(block_size))
    start, ntok = F.col("__start"), F.col("n_tokens")
    first_b = F.expr(f"__start div {int(block_size)}")
    last_b = F.expr(f"(__start + n_tokens - 1) div {int(block_size)}")
    blk = F.col("block_id")
    return (staged.where(ntok > 0)
            .withColumn("block_id", F.explode(F.sequence(first_b, last_b)))
            .select(
                F.col(id_col),
                ntok,
                blk.cast("long").alias("block_id"),
                F.greatest(F.lit(0), blk * b - start)
                 .cast("long").alias("tok_begin"),
                F.least(ntok, (blk + F.lit(1)) * b - start)
                 .cast("long").alias("tok_end"),
                (start + F.greatest(F.lit(0), blk * b - start) - blk * b)
                 .cast("long").alias("block_off"),
            ))


def assign_shards(df: DataFrame, target_bytes: int, id_col: str = "image_id",
                  size_col: str = "bytes_len", salt: str = "shard-v1",
                  method: str = "xxhash64",
                  partitions: int | None = None) -> DataFrame:
    """WebDataset-style byte-balanced output sharding: every row gets a
    ``shard_id`` such that shards hold ~``target_bytes`` each and no row
    splits across shards — the export layout for image+caption corpora
    (one tar/parquet file per shard, written by a simple
    ``repartition("shard_id")`` with zero further logic).

    Rows are ordered by the salted stable hash (a deterministic global
    shuffle, so adjacent-by-source images scatter), and
    ``shard_id = floor(exclusive_cumsum(size) / target_bytes)`` — the
    item whose bytes straddle a boundary belongs wholly to the shard its
    first byte lands in, so shard sizes are target ± one item.  Same
    dataflow as :func:`pack_sequences`'s cumsum: range partition, local
    window, #partitions-row offsets broadcast; no single-partition
    window, no collect, no explode at all — one output row per valid
    input (rows with a null or negative size are dropped up front, the
    same guard as :func:`pack_sequences`; zero-byte rows are kept).
    ``size_col`` is typically ``length(bytes) + length(caption)``
    computed upstream; any non-negative long works.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    spark = df.sparkSession
    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)
    base = df.withColumn("__h", order_hash(id_col, salt, method)) \
             .withColumn("__need", F.col(size_col).cast("long"))
    # same guard as pack_sequences: a null/negative size would silently
    # shift every later start offset — drop such rows (zero is valid)
    base = base.where(F.col("__need").isNotNull() & (F.col("__need") >= 0))
    staged = _global_excl_cumsum(base, id_col, partitions)
    # long `div`, not floor(a / b): exact at any cumulative byte count
    # (double division loses integers past 2^53 — see pack_sequences)
    return (staged.withColumn(
                "shard_id", F.expr(f"__start div {int(target_bytes)}"))
            .drop("__h", "__need", "__start"))


def pack_epochs(df: DataFrame, block_size: int, n_epochs: int,
                salt: str = "pack", **kwargs) -> DataFrame:
    """Multi-epoch packing: each epoch is an independent stable shuffle
    of the same corpus (salt ``{salt}-e{i}``), packed separately, with an
    ``epoch`` column and epoch-offset block ids so the union is one flat
    training sequence.  The per-epoch stride is ceil(total stream length
    / block_size) computed from the corpus itself (a 1-row broadcast, no
    collect) — NOT an epoch's max covered block id, which is
    arrangement-dependent when zero-token docs sit at a stream tail and
    could under-count by one, colliding two epochs' id ranges."""
    if n_epochs <= 0:
        raise ValueError(f"n_epochs must be positive, got {n_epochs}")
    eos = int(kwargs.get("eos", 1))
    tokens_col = kwargs.get("tokens_col")
    text_col = kwargs.get("text_col", "text")
    n = (F.col(tokens_col) if tokens_col else token_count(F.col(text_col)))
    valid = (df.select(n.cast("long").alias("__n"))
             .where(F.col("__n").isNotNull() & (F.col("__n") >= 0)))
    stride = F.broadcast(valid.agg(
        F.coalesce(
            F.ceil((F.sum("__n") + F.count("*") * F.lit(eos))
                   / F.lit(int(block_size))).cast("long"),
            F.lit(0)).alias("__stride")))
    epochs = [pack_sequences(df, block_size, salt=f"{salt}-e{i}", **kwargs)
              .withColumn("epoch", F.lit(i)) for i in range(n_epochs)]
    out = epochs[0]
    for e in epochs[1:]:
        out = out.unionByName(e)
    return (out.join(stride)
            .withColumn("block_id",
                        F.col("block_id")
                        + F.col("epoch").cast("long") * F.col("__stride"))
            .drop("__stride"))


def materialize_blocks(packed: DataFrame, docs: DataFrame, block_size: int,
                       id_col: str = "doc_id", text_col: str = "text",
                       eos_token="<|endoftext|>",
                       tokens_col: str | None = None) -> DataFrame:
    """Turn the block map into actual fixed-length token blocks — the
    writer the map exists for, demonstrating its no-further-shuffle
    claim: ONE join (map x docs on the id) and ONE groupBy(block_id),
    both on rows bounded by ``block_size``; everything else is array
    lambdas inside codegen.

    Every stream position not covered by a document slice is a separator
    (or, in the final block, padding) **by construction of the map**, so
    gap-filling with ``eos_token`` reconstructs the stream exactly:
    each output row is ``(block_id, tokens, n_doc_tokens)`` with
    ``size(tokens) == block_size`` for every block.  One caveat: only
    blocks containing at least one document slice are emitted — a block
    made ENTIRELY of separators (possible only when >= block_size
    consecutive eos positions accrue from a run of zero-token docs,
    never with the default whitespace counter, whose minimum is 1) has
    no map row to group and is skipped; a writer emitting such corpora
    should iterate the map's block ids, not a dense 0..max range.

    Two token sources, mirroring :func:`pack_sequences`'s two counters:

    * default — whitespace-split ``text_col`` (string tokens, matching
      the map's default ``token_count``); ``eos_token`` is the separator
      STRING.
    * ``tokens_col`` — a precomputed array column of a real tokenizer's
      ids (``array<int>``/``array<long>``/``array<string>`` all work;
      the element type is read from the schema), for maps built with
      ``pack_sequences(tokens_col=size(ids))``.  ``eos_token`` is then
      the separator ID (e.g. 0 or 50256) and is cast to the element
      type, so the output blocks are id arrays a training job consumes
      directly.  The map's per-doc count and ``size(tokens_col)`` must
      agree — they came from the same tokenizer by construction.
    """
    if tokens_col is not None:
        toks = F.col(tokens_col)
        elem_t = docs.schema[tokens_col].dataType.elementType.simpleString()
        # fail fast on a separator that cannot represent the element type:
        # the cast would otherwise yield NULL and silently fill every
        # separator/padding position with nulls (e.g. the default string
        # eos_token against array<int> ids)
        if elem_t in ("tinyint", "smallint", "int", "bigint"):
            fits = isinstance(eos_token, int) and not isinstance(eos_token,
                                                                 bool)
        elif elem_t in ("float", "double"):
            fits = (isinstance(eos_token, (int, float))
                    and not isinstance(eos_token, bool))
        else:
            fits = True  # string-ish element types take any str separator
        if not fits:
            raise TypeError(
                f"eos_token {eos_token!r} does not represent an "
                f"array<{elem_t}> separator id; pass e.g. eos_token=0")
    else:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        elem_t = "string"
    sliced = (packed.join(docs.select(F.col(id_col), toks.alias("__toks")),
                          id_col)
              .withColumn("__slice",
                          F.slice(F.col("__toks"),
                                  F.col("tok_begin") + F.lit(1),
                                  F.col("tok_end") - F.col("tok_begin")))
              .select("block_id", "block_off", "__slice"))
    entries = sliced.groupBy("block_id").agg(
        F.sort_array(F.collect_list(
            F.struct(F.col("block_off").alias("off"),
                     F.col("__slice").alias("toks")))).alias("__es"))
    eos, b = F.lit(eos_token).cast(elem_t), F.lit(int(block_size))
    zero = F.struct(F.array().cast(f"array<{elem_t}>").alias("arr"),
                    F.lit(0).cast("long").alias("pos"))
    filled = F.aggregate(
        F.col("__es"), zero,
        lambda acc, e: F.struct(
            F.concat(acc["arr"],
                     F.array_repeat(eos, (e["off"] - acc["pos"])
                                    .cast("int")),
                     e["toks"]).alias("arr"),
            (e["off"] + F.size(e["toks"]).cast("long")).alias("pos")),
        lambda acc: F.concat(
            acc["arr"],
            F.array_repeat(eos, (b.cast("long") - acc["pos"]).cast("int"))))
    return entries.select(
        "block_id", filled.alias("tokens"),
        F.aggregate(F.col("__es"), F.lit(0).cast("long"),
                    lambda acc, e: acc + F.size(e["toks"]).cast("long"))
         .alias("n_doc_tokens"))


def packing_stats(packed: DataFrame, block_size: int) -> DataFrame:
    """Per-block audit: slice count, doc-token fill, fill fraction (the
    remainder of every block is separators, plus padding in the last).
    One map-side-combinable groupBy on the already-bounded block map."""
    return (packed.groupBy("block_id")
            .agg(F.count("*").alias("n_slices"),
                 F.sum(F.col("tok_end") - F.col("tok_begin"))
                  .alias("doc_tokens"))
            .withColumn("fill_frac",
                        F.round(F.col("doc_tokens") / F.lit(float(block_size)),
                                4)))
