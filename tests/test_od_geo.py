

def test_geo_dbscan_matches_pure_python(spark):
    """Replay the whole grid-DBSCAN — macro-cells, corpus-scaled
    density bar, 8-neighbor union-find, singleton clusters — in
    plain Python over the operator's own flow frame."""
    from collections import defaultdict

    from bike_analyzer_spark.operators import od as _od
    from tests.conftest import SF_DIR_ORACLE as _SF

    flows = [
        (r.o, r.d, r.flow)
        for r in _od.infer_flows(spark, _SF, minutes=10).collect()
        if r.o != r.d
    ]
    act = defaultdict(int)
    for o, d, f in flows:
        act[o] += f
        act[d] += f
    cells = defaultdict(lambda: [0, 0])
    for k, a in act.items():
        c = cells[((k % 100) // 10, ((k * 7) % 100) // 10)]
        c[0] += a
        c[1] += 1
    n, t = len(cells), sum(v[0] for v in cells.values())
    dense = {ij for ij, v in cells.items() if v[0] * n > t}
    parent = {ij: ij for ij in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in dense:
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                nb = (i + di, j + dj)
                if nb != (i, j) and nb in dense:
                    ra, rb = find((i, j)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    by_cluster = defaultdict(list)
    for ij in dense:
        by_cluster[find(ij)].append(ij)
    want = {}
    for members in by_cluster.values():
        cid = min(i * 10 + j for i, j in members)
        want[cid] = (
            len(members),
            sum(cells[ij][1] for ij in members),
            sum(cells[ij][0] for ij in members),
            min(i for i, _ in members),
            max(i for i, _ in members),
            min(j for _, j in members),
            max(j for _, j in members),
        )
    got = _od.geo_dbscan_clusters(spark, _SF).collect()
    assert {
        r.cluster_id: (
            r.n_cells, r.n_stations, r.total_activity,
            r.min_i, r.max_i, r.min_j, r.max_j,
        )
        for r in got
    } == want
    assert any(r.n_cells > 1 for r in got), "contiguity untested"
    assert all(r.is_singleton == (r.n_cells == 1) for r in got)
