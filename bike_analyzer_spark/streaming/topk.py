"""Streaming heavy hitters — SPACE-SAVING (Metwally et al.) as a
custom stateful operator: the bounded-state answer to "which items
dominate the stream so far", maintained continuously across
micro-batches.

Why a sketch: an exact streaming groupBy-count in update mode keeps
one state row PER DISTINCT ITEM — unbounded on a 100 TB stream of
user ids. Space-saving keeps exactly CAPACITY counters per shard and
still guarantees (the classic bounds, pinned in tests):

  * no undercount ever: est >= true;
  * overcount bounded:  est - err <= true, err <= N_shard/CAPACITY;
  * any item with true count > N_shard/CAPACITY is IN the summary.

Sharding: items hash-partition across HASH_SHARDS group keys
(`pmod(hash(item), shards)`), so every occurrence of an item lands
on the same shard's summary — per-shard guarantees are per-item
guarantees, state is O(shards * CAPACITY), and the global top-k is
a trivial re-rank of the union of shard summaries (shards*CAPACITY
rows — driver-scale, whatever the stream size).

Determinism: within a micro-batch rows process in (ts, event_id)
order (the stateful.py contract); eviction replaces the minimum
(count, err, item) triple — a total order, no tie ambiguity.

Each batch emits the shard's CURRENT summary stamped with a
monotone per-shard revision (n_batches processed), so a reader
takes max-revision rows per shard for the live answer; the memory/
append sink keeps the full revision history for replay tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: counters kept per shard (the sketch's whole state)
CAPACITY = 8
#: item-hash shards = stateful group keys
HASH_SHARDS = 4

OUT_SCHEMA = (
    "shard int, revision bigint, item bigint, est bigint, err bigint"
)
STATE_SCHEMA = (
    "items array<bigint>, counts array<bigint>, errs array<bigint>, "
    "n_batches bigint"
)


def _space_saving_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    if state.exists:
        items, counts, errs, n_batches = state.get
        table = {
            int(i): [int(c), int(e)]
            for i, c, e in zip(items, counts, errs)
        }
    else:
        table, n_batches = {}, 0
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    pdf = pd.concat(frames).sort_values(["ts", "event_id"])
    for item in pdf["item"]:
        item = int(item)
        if item in table:
            table[item][0] += 1
        elif len(table) < CAPACITY:
            table[item] = [1, 0]
        else:
            # evict the minimum (count, err, item) — total order
            evicted = min(
                table.items(), key=lambda kv: (kv[1][0], kv[1][1], kv[0])
            )
            cnt = evicted[1][0]
            del table[evicted[0]]
            table[item] = [cnt + 1, cnt]
    n_batches += 1
    out = sorted(
        ((c, e, i) for i, (c, e) in table.items()), reverse=True
    )
    state.update(
        (
            [i for _, _, i in out],
            [c for c, _, _ in out],
            [e for _, e, _ in out],
            n_batches,
        )
    )
    yield pd.DataFrame(
        {
            "shard": int(shard),
            "revision": n_batches,
            "item": [i for _, _, i in out],
            "est": [c for c, _, _ in out],
            "err": [e for _, e, _ in out],
        }
    )


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """events: streaming frame with ts/event_id/user_id. Returns the
    per-shard space-saving summary stream (item = user_id)."""
    return (
        events.select(
            F.expr(
                f"pmod(hash(user_id), {HASH_SHARDS})"
            ).alias("shard"),
            "ts",
            "event_id",
            F.col("user_id").alias("item"),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _space_saving_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def current_top_k(summaries: DataFrame, k: int = 10) -> DataFrame:
    """Batch read-side: latest revision per shard, re-ranked to the
    global top-k by (est desc, item asc)."""
    from pyspark.sql import Window

    latest = F.max("revision").over(Window.partitionBy("shard"))
    return (
        summaries.withColumn("_latest", latest)
        .where(F.col("revision") == F.col("_latest"))
        .orderBy(F.desc("est"), F.asc("item"))
        .limit(k)
        .select("item", "est", "err")
    )
