"""Connected components vs union-find; near-dup cluster semantics."""

from bike_analyzer_spark.operators import graph
from tests.conftest import SF_DIR_ORACLE

def _union_find(edges):
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}

def test_components_synthetic(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22 + bridge 22-23
    edges = [(1,2),(2,3),(3,4),(10,11),(20,21),(21,22),(20,22),(22,23)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in graph.connected_components(df).collect()}
    assert got == _union_find(edges)

def test_dedup_clusters_match_union_find(spark):
    from bike_analyzer_spark.operators.dedup import dedup_ngram_jaccard
    edges = [(r.a, r.b) for r in
             dedup_ngram_jaccard(spark, SF_DIR_ORACLE).collect()]
    assert edges, "expected non-empty top-20 pairs"
    expected = _union_find(edges)
    got = {r.doc_id: r.cluster_root
           for r in graph.dedup_clusters(spark, SF_DIR_ORACLE).collect()}
    assert got == expected
    kept = {r.cluster_root for r in
            graph.dedup_clusters(spark, SF_DIR_ORACLE).collect()
            if r.is_kept}
    assert kept == set(expected.values())
