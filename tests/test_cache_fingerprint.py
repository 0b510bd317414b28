"""Warehouse-cache invalidation: round 5's postmortem was a
partitioned-events cache materialized by a buggy loader and then
served silently because the fingerprint only covered the source file.
These tests pin both invalidation triggers: source-file change
(driver regenerates testdata) and loader-version bump (we fix the
loader)."""

import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import catalog
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def sf_copy(tmp_path, monkeypatch):
    """A private sf_dir + warehouse so the test can regenerate
    'testdata' without touching the real fixtures or caches."""
    sf = tmp_path / "sf_test"
    sf.mkdir()
    for t in ("events", "documents"):
        shutil.copy(
            os.path.join(SF_DIR_SMOKE, f"{t}.parquet"), sf / f"{t}.parquet"
        )
    monkeypatch.setattr(
        catalog, "PARTITIONED_CACHE_DIR", str(tmp_path / "wh" / "events_by_date")
    )
    return str(sf)


def test_source_regeneration_invalidates_partitioned_cache(spark, sf_copy):
    catalog.events_partitioned(spark, sf_copy)
    d1 = catalog.latest_event_date(sf_copy)
    # regenerate 'testdata': shift every ts by +30 days
    p = os.path.join(sf_copy, "events.parquet")
    t = papq.read_table(p)
    ts_type = t.schema.field("ts").type
    shifted = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pc.add(
            t["ts"].cast("int64"), 30 * 86400 * 1_000_000
        ).cast(ts_type),
    )
    papq.write_table(shifted, p)
    catalog.events_partitioned(spark, sf_copy)
    d2 = catalog.latest_event_date(sf_copy)
    assert d2 > d1, (d1, d2)


def test_loader_version_bump_invalidates_partitioned_cache(spark, sf_copy):
    df = catalog.events_partitioned(spark, sf_copy)
    path = catalog.events_partitioned_path(sf_copy)
    marker = os.path.join(path, "_FINGERPRINT.json")
    with open(marker) as f:
        fp = json.load(f)
    assert fp["loader_version"] == catalog.LOADER_VERSION
    # simulate a cache written by an OLDER loader: poison the data and
    # backdate the version — the next read must rebuild, not serve it
    fp["loader_version"] = catalog.LOADER_VERSION - 1
    with open(marker, "w") as f:
        json.dump(fp, f)
    n_before = df.count()
    again = catalog.events_partitioned(spark, sf_copy)
    with open(marker) as f:
        assert json.load(f)["loader_version"] == catalog.LOADER_VERSION
    assert again.count() == n_before


@pytest.fixture()
def emb_copy(tmp_path, monkeypatch):
    """Private sf_dir + warehouse for the ANN index caches."""
    from bike_analyzer_spark.operators import ivf, pq

    sf = tmp_path / "sf_emb"
    sf.mkdir()
    shutil.copy(
        os.path.join(SF_DIR_SMOKE, "embeddings.parquet"),
        sf / "embeddings.parquet",
    )
    monkeypatch.setattr(
        ivf, "_CACHE_DIR", str(tmp_path / "wh" / "ivf_centroids")
    )
    monkeypatch.setattr(
        pq, "_CACHE_DIR", str(tmp_path / "wh" / "pq_codebooks")
    )
    # embeddings rides the spread copy; point it at the private dir too
    monkeypatch.setattr(
        catalog,
        "PARTITIONED_CACHE_DIR",
        str(tmp_path / "wh" / "events_by_date"),
    )
    return str(sf)


def test_ann_index_caches_build_once_and_invalidate(spark, emb_copy):
    """The persisted IVF centroid / PQ codebook caches: a second call
    serves the stored index (marker untouched), and an embeddings
    regeneration (new mtime) rebuilds it — the round-5 stale-cache
    class of bug, pinned for the ANN indexes."""
    from bike_analyzer_spark.operators import ivf, pq
    from bike_analyzer_spark.operators.similarity import _with_norm

    emb_n = _with_norm(catalog.load(spark, emb_copy, "embeddings"))
    c1 = {
        r.cid: list(r.cemb)
        for r in ivf._index_centroids(spark, emb_copy, emb_n).collect()
    }
    marker = os.path.join(
        ivf._CACHE_DIR,
        os.path.basename(os.path.normpath(emb_copy)),
        "_FINGERPRINT.json",
    )
    m1 = os.stat(marker).st_mtime_ns
    c2 = {
        r.cid: list(r.cemb)
        for r in ivf._index_centroids(spark, emb_copy, emb_n).collect()
    }
    assert c1 == c2
    assert os.stat(marker).st_mtime_ns == m1  # served, not rebuilt

    cb1 = pq._index_codebook(spark, emb_copy, emb_n).count()
    assert cb1 == pq.M_SUB * pq.K_SUB

    # 'regenerate' embeddings: bump mtime — both caches must rebuild
    src = os.path.join(emb_copy, "embeddings.parquet")
    os.utime(src, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns + 1))
    ivf._index_centroids(spark, emb_copy, emb_n).count()
    assert os.stat(marker).st_mtime_ns > m1  # rebuilt


def test_nbq_model_cache_builds_once_and_invalidates(
    spark, sf_copy, tmp_path, monkeypatch
):
    """The persisted NB quality-classifier model (same train-once
    discipline as the ANN indexes): second call serves the store;
    a documents regeneration rebuilds it."""
    from bike_analyzer_spark.operators import classifier

    monkeypatch.setattr(
        classifier, "_CACHE_DIR", str(tmp_path / "wh" / "nbq_model")
    )
    model1, params1 = classifier._index_model(spark, sf_copy)
    w1 = {r.bucket: r.w_unats for r in model1.collect()}
    p1 = params1.collect()[0]
    marker = os.path.join(
        classifier._CACHE_DIR,
        os.path.basename(os.path.normpath(sf_copy)),
        "_FINGERPRINT.json",
    )
    m1 = os.stat(marker).st_mtime_ns
    model2, params2 = classifier._index_model(spark, sf_copy)
    assert {r.bucket: r.w_unats for r in model2.collect()} == w1
    assert params2.collect()[0] == p1
    assert os.stat(marker).st_mtime_ns == m1  # served, not rebuilt

    src = os.path.join(sf_copy, "documents.parquet")
    os.utime(
        src, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns + 1)
    )
    classifier._index_model(spark, sf_copy)
    assert os.stat(marker).st_mtime_ns > m1  # rebuilt


def test_od_flows_cache_builds_once_and_invalidates(
    spark, sf_copy, tmp_path, monkeypatch
):
    """The persisted OD kernel output (same train-once discipline as
    the ANN/NB caches): second call serves the store; an events
    regeneration (new mtime) rebuilds it."""
    import pyarrow.parquet as _pq

    from bike_analyzer_spark.operators import od

    # sf_copy only carries events+documents; od also needs customer
    shutil.copy(
        os.path.join(SF_DIR_SMOKE, "customer.parquet"),
        os.path.join(sf_copy, "customer.parquet"),
    )
    f1 = od.matched_per_bucket(spark, sf_copy)
    n1 = f1.count()
    marker = os.path.join(
        catalog.PARTITIONED_CACHE_DIR.replace("events_by_date", "od_flows"),
        os.path.basename(os.path.normpath(sf_copy)) + "_m10",
        "_FINGERPRINT.json",
    )
    m1 = os.stat(marker).st_mtime_ns
    assert od.matched_per_bucket(spark, sf_copy).count() == n1
    assert os.stat(marker).st_mtime_ns == m1  # served, not rebuilt

    src = os.path.join(sf_copy, "events.parquet")
    os.utime(src, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns + 1))
    od.matched_per_bucket(spark, sf_copy).count()
    assert os.stat(marker).st_mtime_ns > m1  # rebuilt


def test_incr_store_index_builds_once_and_invalidates(spark, sf_copy):
    """The incremental near-dedup store's persisted band+shingle
    index (round-8): second query serves the store artifacts; a
    documents regeneration rebuilds them; results are identical
    either way (the index is a pure materialization)."""
    from bike_analyzer_spark.operators import dedup

    r1 = sorted(map(tuple, dedup.dedup_incr_near(spark, sf_copy).collect()))
    marker = os.path.join(
        catalog.PARTITIONED_CACHE_DIR.replace("events_by_date", "incr_store"),
        os.path.basename(os.path.normpath(sf_copy)),
        "_FINGERPRINT.json",
    )
    m1 = os.stat(marker).st_mtime_ns
    r2 = sorted(map(tuple, dedup.dedup_incr_near(spark, sf_copy).collect()))
    assert r2 == r1
    assert os.stat(marker).st_mtime_ns == m1  # served, not rebuilt

    src = os.path.join(sf_copy, "documents.parquet")
    os.utime(src, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns + 1))
    r3 = sorted(map(tuple, dedup.dedup_incr_near(spark, sf_copy).collect()))
    assert os.stat(marker).st_mtime_ns > m1  # rebuilt
    assert r3 == r1  # same bytes -> same answer
