"""CLI entry point: fixture-driven ingest + query listing, driven
through main() (same argv surface the shell sees)."""

import json, os, shutil, uuid

import pytest

from bike_analyzer_spark import cli
from tests.test_sources import SI, SS

@pytest.fixture()
def tdir():
    d = f"/root/repo/.pytest_cache/cli-{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)

def test_cli_ingest_gbfs_fixture(spark, tdir, capsys):
    si_p, ss_p = os.path.join(tdir, "si.json"), os.path.join(tdir, "ss.json")
    json.dump(SI, open(si_p, "w")); json.dump(SS, open(ss_p, "w"))
    wh = os.path.join(tdir, "wh")
    rc = cli.main(["ingest-gbfs", "--warehouse", wh, "--fixture", si_p, ss_p])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"stations_upserted": 2, "status_rows": 2}
    assert os.path.exists(os.path.join(wh, "stations.parquet"))

def test_cli_list_and_unknown_query(spark, capsys):
    assert cli.main(["list-queries"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_network_summary" in names and len(names) >= 40
    assert cli.main(["query", "nope_not_real"]) == 2


def test_cli_explain(spark, capsys):
    from tests.conftest import SF_DIR_SMOKE

    assert (
        cli.main(
            ["explain", "q2_top10_value_ratio", "--sf-dir", SF_DIR_SMOKE]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "Scan parquet" in out
    assert cli.main(["explain", "nope_not_real"]) == 2


def test_cli_optimize_compacts_and_builds_stats(spark, tdir, capsys):
    import json as _json

    from bike_analyzer_spark.sources import skipping
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_SMOKE

    path = os.path.join(tdir, "tbl")
    load(spark, SF_DIR_SMOKE, "events").repartition(24).write.parquet(path)
    rc = cli.main(["optimize", path, "--stats", "user_id", "ts"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_before"] == 24
    assert out["files_after"] < 24
    assert out["stats_cols"] == ["user_id", "ts"]
    # the sidecar is immediately usable for pruned reads
    assert skipping.candidate_files(spark, path, "user_id", -10, -1) == []


def test_cli_optimize_refreshes_existing_sidecar_without_flag(
    spark, tdir, capsys
):
    import json as _json

    from bike_analyzer_spark.sources import skipping
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_SMOKE

    path = os.path.join(tdir, "tbl2")
    load(spark, SF_DIR_SMOKE, "events").repartition(8).write.parquet(path)
    skipping.build_stats(spark, path, ["user_id"])
    rc = cli.main(["optimize", path])  # no --stats
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats_cols"] == ["user_id"]
    # sidecar tracks the COMPACTED file set, not the stale one
    files = set(
        r.file for r in spark.read.parquet(
            skipping._stats_path(path)).select("file").collect()
    )
    assert len(files) == out["files_after"]


def test_cli_optimize_zorder_rewrite(spark, tdir, capsys):
    import json as _json

    from bike_analyzer_spark.sources import skipping
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_SMOKE

    path = os.path.join(tdir, "tblz")
    src = load(spark, SF_DIR_SMOKE, "events")
    src.repartition(8).write.parquet(path)
    rc = cli.main(
        ["optimize", path, "--zorder", "user_id", "ts",
         "--n-files", "64", "--stats", "user_id", "ts"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["zorder"] == ["user_id", "ts"]
    after = spark.read.parquet(path)
    assert after.count() == src.count()          # lossless rewrite
    assert set(after.columns) == set(src.columns)  # no helper cols leak
    # the freshly built sidecar prunes a narrow user band hard
    b = src.agg({"user_id": "min"}).collect()[0][0], src.agg(
        {"user_id": "max"}).collect()[0][0]
    span = b[1] - b[0]
    lo, hi = b[0] + span * 45 // 100, b[0] + span * 55 // 100
    files = skipping.candidate_files(spark, path, "user_id", lo, hi)
    n_total = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert 0 < len(files) <= n_total // 2


def test_cli_build_corpus(spark, tdir, capsys):
    import json as _json

    from tests.conftest import SF_DIR_SMOKE

    table = os.path.join(tdir, "corpus")
    rc = cli.main(["build-corpus", table, "--sf-dir", SF_DIR_SMOKE,
                   "--shards", "4"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1 and out["n_shards"] == 4
    assert out["train_rows"] + out["val_rows"] == out["docs_kept"] > 0
