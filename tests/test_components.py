"""Connected-components / duplicate-cluster resolution tests.

The operator under test turns near-duplicate PAIRS into duplicate
CLUSTERS (component label = min reachable id) — the step a corpus
dedup needs between candidate generation and "keep one per cluster".
"""

import random

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import (
    connected_components,
    duplicate_clusters,
)


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_chain_converges_to_min(spark):
    # a 6-node path: pointer jumping must fold it to min id 0
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {i: 0 for i in range(6)}


def test_two_components_and_singletons(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], "doc_id long")
    got = _labels(connected_components(pairs, all_ids=ids))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_empty_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    got = _labels(connected_components(pairs, all_ids=ids))
    assert got == {i: i for i in range(4)}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    expect = {i: min(comp[find(i)]) for i in range(n)}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = _labels(connected_components(pairs, all_ids=ids))
    assert got == expect


def test_duplicate_clusters_canonical_and_sizes(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 4)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 3, 1),
        1: (0, 3, 0),
        4: (0, 3, 0),
        2: (2, 1, 1),
        3: (3, 1, 1),
        5: (5, 1, 1),
    }
    # the deduped corpus = canonical rows only
    kept = sorted(r for r, v in rows.items() if v[2] == 1)
    assert kept == [0, 2, 3, 5]
