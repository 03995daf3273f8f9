"""Connected-components / cluster-dedup operator tests.

Oracle: a driver-side union-find (pure Python) — the textbook sequential
algorithm, trivially correct, checked against the distributed
large-star/small-star dataflow on structured and random graphs.
"""

import random

from pyspark.sql import functions as F

from kit_spark.functions.components import (connected_components,
                                            dedup_cluster_losers)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    comp_min = {}
    for n in nodes:
        comp_min.setdefault(find(n), []).append(n)
    return {n: min(comp_min[find(n)]) for n in nodes}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expect = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == expect


def test_pairwise_vs_cluster_divergence_example(spark):
    """The {1,3,5} example from the module docstring: pairwise loser
    removal keeps 3 (never the larger of a pair it appears in is false —
    3 < 5 in both its pairs), cluster dedup drops it."""
    pairs = spark.createDataFrame([(3, 5), (1, 5)], "a long, b long")
    losers = {r["doc_id"] for r in dedup_cluster_losers(pairs).collect()}
    assert losers == {3, 5}
    pairwise_losers = {5}  # larger id of each pair: (3,5)->5, (1,5)->5
    assert pairwise_losers != losers


def test_structured_graphs(spark):
    _check(spark, [(1, 2)])                               # single edge
    _check(spark, [(i, i + 1) for i in range(1, 30)])     # long chain
    _check(spark, [(a, b) for a in range(1, 6)
                   for b in range(a + 1, 6)])             # clique
    _check(spark, [(1, 2), (3, 4), (5, 6), (10, 20)])     # disjoint pairs
    _check(spark, [(2, 1), (2, 1), (1, 2)])               # dup + reversed
    # two chains sharing one bridge node
    _check(spark, [(1, 10), (10, 20), (20, 30), (2, 30), (100, 200)])


def test_random_graphs_vs_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60 + trial * 40
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(n // 2)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_string_node_ids(spark):
    """String ids (e.g. image ids) work directly — no surrogate hash —
    with the lexicographic min as each component's representative, and
    match the union-find oracle on the same string universe."""
    edges = [("img-07", "img-03"), ("img-03", "img-99"),   # chain
             ("a", "b"), ("b", "c"), ("c", "a"),           # cycle
             ("zz", "z")]                                  # lexicographic
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}
    nodes = sorted({x for e in edges for x in e})
    assert got == _union_find(edges, nodes)
    assert got["img-99"] == "img-03" and got["zz"] == "z"
    losers = {r["doc_id"] for r in dedup_cluster_losers(df).collect()}
    assert losers == {"img-07", "img-99", "b", "c", "zz"}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_cluster_losers_on_documents(spark):
    """End-to-end over the real near-dup pipeline at sf0.001: the kept
    set is every component's min-id doc, checked against union-find of
    the same verified >=0.8 pairs."""
    from kit_spark.functions import dedup as DD

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .repartition(8)
    sig = DD.minhash_signatures(docs, k=8, n=3, method="xxhash64")
    cand = DD.lsh_candidate_pairs(sig, k=8, rows_per_band=2)
    verified = DD.ngram_jaccard_pairs(docs, cand, n=3) \
        .where(F.col("jaccard") >= 0.8)
    pairs = [(r["a"], r["b"]) for r in verified.collect()]
    assert pairs, "fixture should contain planted near-dups"
    nodes = sorted({x for e in pairs for x in e})
    expect_losers = {n for n, rep in
                     _union_find(pairs, nodes).items() if n != rep}
    got = {r["doc_id"] for r in dedup_cluster_losers(verified).collect()}
    assert got == expect_losers
