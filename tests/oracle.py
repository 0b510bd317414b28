"""Differential-test harness mimicking the driver's correctness gate:
run the Spark query and the DuckDB oracle SQL on the same parquet,
compare row count, column names, and an order-insensitive value
multiset (columns sorted by name, rows sorted by their stringified
form — a stricter stand-in for the driver's value hash).
"""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse float noise below the rounding we apply in queries
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in colnames), out


def spark_result(df):
    return _normalize([tuple(r) for r in df.collect()], df.columns)


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return _normalize(cur.fetchall(), cols)


def assert_matches_oracle(spark_df, duck_con, oracle_sql, name=""):
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(duck_con, oracle_sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
