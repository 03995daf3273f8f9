"""Connected components over near-duplicate pair graphs — cluster-level
dedup (the transitive-closure policy production curation pipelines use).

``docs_clean_corpus`` removes the larger id of each verified pair — the
*pairwise* policy, which keeps a doc whose every neighbor happens to be
larger (component {1,3,5} with edges (3,5),(1,5): pairwise keeps 3).  The
cluster policy instead keeps exactly one representative (the min id) per
*connected component* of the near-dup graph: chains a~b, b~c collapse to
one kept doc even when a!~c directly.

Algorithm: the alternating **large-star / small-star** method of Kiveris,
Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected Components in
MapReduce and Beyond" (SoCC 2014) — O(log^2 n) rounds worst case, and in
practice 2-4 rounds on dedup graphs (LSH clusters are near-cliques with
tiny diameter).  Chosen over naive min-label propagation because
propagation needs O(diameter) rounds — a pathological 10^6-doc chain
(each doc near-dup of the next) would take 10^6 shuffles; the star
operations contract such chains logarithmically.

Scale shape (10^10-edge graph on a 1000-executor cluster):

* Each star operation is groupBy(u).min + a re-join on u — two shuffles
  on the node id, map-side combined, **no collect_list** (the textbook
  formulation materializes each node's neighbor list, which a mega-node
  — one doc near-duplicating millions — would blow up; the join
  formulation streams neighbors past the min instead).
* Convergence check is a single-row signature aggregate (count +
  order-insensitive hash-sum), not a set comparison — one tiny job per
  round, no driver-side edge data.
* Iteration happens on the driver but touches only the signature row per
  round; edge data never leaves executors.  Each round's edge set is
  checkpointed to truncate the logical plan — without it the iterative
  loop nests every prior round's plan and analysis cost explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
    return fwd.unionByName(fwd.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))


def _min_neighbor(sym: DataFrame) -> DataFrame:
    """m(u) = min(neighbors(u) ∪ {u}) — groupBy min, no neighbor lists."""
    return (sym.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m")))


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m(u).  (Kiveris et al. §3)"""
    m = _min_neighbor(sym)
    return (sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b")))


def _small_star(sym: DataFrame) -> DataFrame:
    """Connect every neighbor v <= u (and u itself) to the min of that
    small-neighborhood.  Operates on edges oriented large->small."""
    down = sym.where(F.col("v") <= F.col("u"))
    m = (down.groupBy("u")
         .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    nbr = (down.join(m, "u")
           .select(F.col("v").alias("a"), F.col("m").alias("b")))
    self_edge = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return nbr.unionByName(self_edge).where(F.col("a") != F.col("b"))


def _signature(edges: DataFrame) -> tuple[int, int]:
    # sum the 64-bit hashes in decimal(38,0): a plain long sum overflows
    # under ANSI mode on any non-trivial edge set
    row = (edges.select(F.xxhash64("a", "b").cast("decimal(38,0)").alias("h"))
           .agg(F.count("*").alias("n"), F.sum("h").alias("s")).collect()[0])
    return int(row["n"]), int(row["s"] or 0)


def connected_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(a, b) undirected edge pairs -> (doc_id, component) where
    ``component`` is the minimum node id reachable from ``doc_id``.

    Deterministic (min-id representative), pure dataflow: per round two
    star contractions (four shuffles) + a one-row convergence signature.
    ``max_rounds`` is a diverge guard far above the O(log^2 n) bound —
    hitting it raises rather than returning a partial labeling.

    Node ids may be any orderable type: numeric ids are normalized to
    long (so int/bigint inputs union cleanly); anything else — string
    doc/image ids in particular — is used as-is, with the lexicographic
    min as the representative.  Exact ids beat a 64-bit surrogate hash:
    a hash collision between two ids would silently merge unrelated
    clusters (birthday bound ~3 expected colliding pairs at 10^10 nodes),
    whereas the only cost of exact string keys is wider shuffle rows in
    the star contractions.  Callers who need the narrower shuffle can
    still pre-map ids through a surrogate themselves, accepting that
    bound.

    Each round's edge set is materialized with ``localCheckpoint`` — an
    iterative DataFrame loop that only persists still *nests* every
    previous round's logical plan, and Catalyst re-analysis cost grows
    superlinearly with rounds (a 30-node chain took minutes; checkpointed
    it is seconds).  On a cluster with a checkpoint dir configured,
    reliable ``checkpoint()`` is the drop-in hardening (localCheckpoint
    ties the truncated lineage to executor liveness).
    """
    from pyspark.sql.types import NumericType

    if isinstance(pairs.schema["a"].dataType, NumericType):
        pairs = pairs.select(F.col("a").cast("long"),
                             F.col("b").cast("long"))
    edges = (pairs.select("a", "b")
             .where(F.col("a") != F.col("b"))
             .select(F.least("a", "b").alias("a"),
                     F.greatest("a", "b").alias("b"))
             .distinct().localCheckpoint(eager=True))
    nodes = (edges.select(F.col("a").alias("doc_id"))
             .unionByName(edges.select(F.col("b").alias("doc_id")))
             .distinct().localCheckpoint(eager=True))

    sig = _signature(edges)
    for _ in range(max_rounds):
        stepped = _small_star(_symmetric(_large_star(_symmetric(edges)))) \
            .distinct().localCheckpoint(eager=True)
        new_sig = _signature(stepped)
        edges = stepped  # previous round's checkpoint is GC-reclaimed
        if new_sig == sig:  # star-graph fixpoint: every edge (v, root)
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in "
                           f"{max_rounds} rounds")

    return (nodes.join(edges.select(F.col("a").alias("doc_id"),
                                    F.col("b").alias("component")),
                       "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("component")))


def dedup_cluster_losers(pairs: DataFrame) -> DataFrame:
    """Cluster-level dedup verdicts: every doc that is NOT its
    component's min-id representative -> one (doc_id) row to drop.
    The transitive twin of docs_clean_corpus's pairwise loser rule."""
    cc = connected_components(pairs)
    return (cc.where(F.col("doc_id") != F.col("component"))
            .select("doc_id"))
