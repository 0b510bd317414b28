"""Property-based check of the union-marker as-of join against pandas
`merge_asof` — a third independent implementation (the oracle suite
already cross-checks DuckDB's native ASOF JOIN; hypothesis explores
the adversarial corners none of the fixtures contain: ties between
left and right timestamps, duplicate right timestamps, keys with no
right rows, left rows before any right row)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bike_analyzer_spark.operators.asof import asof_join_backward

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)
VAL = st.integers(min_value=-100, max_value=100)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12),
    right=st.lists(st.tuples(KEYS, TS, VAL), min_size=1, max_size=12),
)
def test_asof_backward_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k int, ts int, lrow int",
    )
    # duplicate right timestamps per key are legal; merge_asof takes
    # the LAST one in sort order, so deduplicate to make the expected
    # value well-defined under both implementations' tie rules
    rdedup = {}
    for k, t, v in right:
        rdedup[(k, t)] = v
    rrows = [(k, t, v) for (k, t), v in sorted(rdedup.items())]
    rdf = spark.createDataFrame(rrows, "k int, ts int, v int")

    got = {
        (r.k, r.ts, r.lrow): r.v
        for r in asof_join_backward(
            ldf, rdf, "ts", ["v"], by=["k"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        columns=["k", "ts", "lrow"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable"
    )
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward"
    )
    exp = {
        (row.k, row.ts, row.lrow): (None if pd.isna(row.v) else int(row.v))
        for row in exp_df.itertuples()
    }
    assert got == exp
