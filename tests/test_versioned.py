"""Versioned tables: time travel, snapshot isolation for in-flight
readers, crash-orphan invisibility, and vacuum retention."""

import os
import shutil

import pytest

from bike_analyzer_spark.sources import versioned
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _snap(spark, n):
    return load(spark, SF_DIR_SMOKE, "documents").limit(n)


def test_commit_read_and_time_travel(spark, tdir):
    assert versioned.latest_version(tdir) == 0
    v1 = versioned.commit(_snap(spark, 10), tdir)
    v2 = versioned.commit(_snap(spark, 25), tdir)
    assert (v1, v2) == (1, 2)
    assert versioned.read(spark, tdir).count() == 25          # latest
    assert versioned.read(spark, tdir, 1).count() == 10       # time travel
    assert [h["version"] for h in versioned.history(tdir)] == [1, 2]
    assert [h["n_rows"] for h in versioned.history(tdir)] == [10, 25]
    with pytest.raises(KeyError):
        versioned.read(spark, tdir, 3)


def test_snapshot_isolation_for_inflight_reader(spark, tdir):
    """A reader resolved before a commit keeps seeing ITS snapshot:
    version files are immutable, so the new commit can't truncate or
    change a running scan — the property the .staging swap cannot
    give."""
    versioned.commit(_snap(spark, 10), tdir)
    reader = versioned.read(spark, tdir)          # resolves v1 paths
    versioned.commit(_snap(spark, 25), tdir)      # v2 publishes
    assert reader.count() == 10                   # still the v1 snapshot
    assert versioned.read(spark, tdir).count() == 25


def test_crashed_commit_orphan_is_invisible_then_overwritten(spark, tdir):
    versioned.commit(_snap(spark, 10), tdir)
    # simulate a crash: v2 data landed but the manifest never updated
    orphan = versioned._version_dir(tdir, 2)
    _snap(spark, 5).write.mode("overwrite").parquet(orphan)
    assert versioned.latest_version(tdir) == 1
    assert versioned.read(spark, tdir).count() == 10   # orphan invisible
    # the next commit claims version 2 cleanly
    v2 = versioned.commit(_snap(spark, 25), tdir)
    assert v2 == 2
    assert versioned.read(spark, tdir, 2).count() == 25


def test_vacuum_retires_old_versions(spark, tdir):
    for n in (5, 10, 15, 20):
        versioned.commit(_snap(spark, n), tdir)
    retired = versioned.vacuum(tdir, keep_last=2)
    assert retired == [1, 2]
    assert [h["version"] for h in versioned.history(tdir)] == [3, 4]
    assert versioned.read(spark, tdir, 4).count() == 20
    with pytest.raises(KeyError):
        versioned.read(spark, tdir, 1)
    assert not os.path.exists(versioned._version_dir(tdir, 1))
    # idempotent / bounded
    assert versioned.vacuum(tdir, keep_last=2) == []
    with pytest.raises(ValueError):
        versioned.vacuum(tdir, keep_last=0)


def test_skipping_composes_with_versions(spark, tdir):
    """The per-file stats sidecar works against a version directory —
    metadata pruning and time travel are orthogonal."""
    from bike_analyzer_spark.sources import skipping

    versioned.commit(
        load(spark, SF_DIR_SMOKE, "events").repartitionByRange(4, "user_id"),
        tdir,
    )
    vdir = versioned._version_dir(tdir, 1)
    skipping.build_stats(spark, vdir, ["user_id"])
    lo = (
        versioned.read(spark, tdir)
        .agg({"user_id": "min"})
        .collect()[0][0]
    )
    files = skipping.candidate_files(spark, vdir, "user_id", lo, lo)
    assert 1 <= len(files) < 4


def test_commit_upsert_preserves_history(spark, tdir):
    """Newer-wins merge publishes a new version; the pre-merge state
    stays readable — rollback/audit the swap sink can't offer."""
    from pyspark.sql import functions as F

    base = _snap(spark, 10).withColumn("rev", F.lit(1))
    versioned.commit_upsert(base, tdir, ["doc_id"], "rev")
    update = (
        _snap(spark, 3)
        .withColumn("rev", F.lit(2))
        .withColumn("text", F.lit("UPDATED"))
    )
    v2 = versioned.commit_upsert(update, tdir, ["doc_id"], "rev")
    assert v2 == 2
    latest = versioned.read(spark, tdir)
    assert latest.count() == 10                       # keys merged
    assert latest.filter("text = 'UPDATED'").count() == 3
    # stale update loses (newer-wins), and v1 is untouched history
    stale = (
        _snap(spark, 1)
        .withColumn("rev", F.lit(0))
        .withColumn("text", F.lit("STALE"))
    )
    versioned.commit_upsert(stale, tdir, ["doc_id"], "rev")
    assert versioned.read(spark, tdir).filter("text = 'STALE'").count() == 0
    assert versioned.read(spark, tdir, 1).filter(
        "text = 'UPDATED'").count() == 0


def test_rollback_is_metadata_only_and_vacuum_safe(spark, tdir):
    import os as _os

    versioned.commit(_snap(spark, 10), tdir)
    versioned.commit(_snap(spark, 25), tdir)     # the "bad" version
    v3 = versioned.rollback(tdir, 1)
    assert v3 == 3
    assert versioned.read(spark, tdir).count() == 10   # restored
    # metadata-only: no v00003 data directory was written
    assert not _os.path.exists(versioned._version_dir(tdir, 3))
    # the bad version stays auditable
    assert versioned.read(spark, tdir, 2).count() == 25
    # vacuum keeping only the rollback must NOT delete v1's files,
    # which version 3 aliases
    versioned.vacuum(tdir, keep_last=1)
    assert versioned.read(spark, tdir).count() == 10
    assert _os.path.exists(versioned._version_dir(tdir, 1))
    assert not _os.path.exists(versioned._version_dir(tdir, 2))
    # rollback-of-rollback resolves one hop, not a chain
    v4 = versioned.rollback(tdir, 3)
    assert versioned.read(spark, tdir, v4).count() == 10


def test_diff_captures_inserts_updates_deletes(spark, tdir):
    from pyspark.sql import functions as F

    base = _snap(spark, 10).withColumn("rev", F.lit(1))
    versioned.commit(base, tdir)
    changed = (
        base.filter("doc_id % 3 != 0")                 # delete some
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 3 == 1, F.lit("CHANGED")).otherwise(
                F.col("text")
            ),
        )
    )
    extra = _snap(spark, 12).exceptAll(_snap(spark, 10)).withColumn(
        "rev", F.lit(1)
    )
    versioned.commit(changed.unionByName(extra), tdir)
    d = {
        r.doc_id: r.change
        for r in versioned.diff(spark, tdir, 1, 2, ["doc_id"]).collect()
    }
    base_ids = [r.doc_id for r in base.select("doc_id").collect()]
    for i in base_ids:
        if i % 3 == 0:
            assert d[i] == "delete"
        elif i % 3 == 1:
            assert d[i] == "update"
        else:
            assert i not in d                      # unchanged: absent
    extra_ids = [r.doc_id for r in extra.select("doc_id").collect()]
    assert extra_ids and all(d[i] == "insert" for i in extra_ids)


def test_diff_digest_distinguishes_null_shift_and_boundary_shift(
    spark, tdir
):
    """The CDC row digest must not collide rows a separator-free or
    NULL-skipping concat would merge: ('x', NULL) vs (NULL, 'x'),
    NULL vs '', and ('ab','c') vs ('a','bc') are all real updates
    (round-7 ADVICE)."""
    schema = "k long, c1 string, c2 string"
    v1 = spark.createDataFrame(
        [(1, "x", None), (2, None, None), (3, "ab", "c"), (4, "s", "s")],
        schema,
    )
    v2 = spark.createDataFrame(
        [(1, None, "x"), (2, "", None), (3, "a", "bc"), (4, "s", "s")],
        schema,
    )
    versioned.commit(v1, tdir)
    versioned.commit(v2, tdir)
    changes = {
        r.k: r.change
        for r in versioned.diff(spark, tdir, 1, 2, ["k"]).collect()
    }
    assert changes == {1: "update", 2: "update", 3: "update"}


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k bigint, val string, n bigint")


def test_merge_into_all_three_clauses(spark, tdir):
    """One MERGE exercising DELETE / UPDATE / conditional INSERT /
    untouched-target / matched-but-no-clause rows simultaneously."""
    versioned.commit(
        _kv(
            spark,
            [(1, "keep", 10), (2, "upd", 20), (3, "del", 30), (4, "idle", 40)],
        ),
        tdir,
    )
    src = _kv(
        spark,
        [
            (2, "newval", 200),   # matched -> update
            (3, "whatever", 0),   # matched -> delete (val = 'del')
            (5, "ins", 50),       # not matched -> insert (n >= 50)
            (6, "small", 4),      # not matched, fails insert condition
        ],
    )
    v = versioned.merge_into(
        src,
        tdir,
        ["k"],
        update_set={"val": "s_val", "n": "t_n + s_n"},
        delete_condition="t_val = 'del'",
        insert_condition="s_n >= 50",
    )
    assert v == 2
    got = {
        r.k: (r.val, r.n)
        for r in versioned.read(spark, tdir).collect()
    }
    assert got == {
        1: ("keep", 10),      # target-only: untouched
        2: ("newval", 220),   # updated: t_n + s_n
        4: ("idle", 40),      # target-only: untouched
        5: ("ins", 50),       # inserted
    }
    # pre-merge snapshot still queryable (the point of versioned MERGE)
    old = {
        r.k for r in versioned.read(spark, tdir, version=1).collect()
    }
    assert old == {1, 2, 3, 4}


def test_merge_into_rejects_duplicate_source_keys(spark, tdir):
    versioned.commit(_kv(spark, [(1, "a", 1)]), tdir)
    dup = _kv(spark, [(1, "x", 1), (1, "y", 2)])
    with pytest.raises(ValueError, match="duplicate keys"):
        versioned.merge_into(dup, tdir, ["k"])


def test_merge_into_insert_only_and_delete_only(spark, tdir):
    versioned.commit(_kv(spark, [(1, "a", 1), (2, "b", 2)]), tdir)
    # pure upsert-insert: no clauses but insert
    versioned.merge_into(_kv(spark, [(3, "c", 3)]), tdir, ["k"])
    assert {
        r.k for r in versioned.read(spark, tdir).collect()
    } == {1, 2, 3}
    # pure delete: matched rows vanish, insert disabled
    versioned.merge_into(
        _kv(spark, [(1, "zz", 0), (9, "zz", 0)]),
        tdir,
        ["k"],
        delete_condition="true",
        insert=False,
    )
    assert {
        r.k for r in versioned.read(spark, tdir).collect()
    } == {2, 3}
