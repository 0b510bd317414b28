"""Stateful streaming: the per-station inventory delta (W1,
reference od_inference.py:51-53) as a real cross-batch streaming
operator (SURVEY.md §2.9 "per-station running diff is cross-batch
state when streamed").

`applyInPandasWithState` keeps one tiny state row per station — the
last seen (scraped_at, num_bikes_available) — so each micro-batch
emits deltas against the PREVIOUS batch's tail, which a stateless
window cannot do. State size is O(|stations|), independent of stream
length; GroupStateTimeout is off because station state never expires
in the reference model.

Ordering contract: within a micro-batch rows are sorted by
(scraped_at); across batches arrival order is the poll order — the
same assumption the reference makes by appending polls sequentially.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DELTA_SCHEMA = (
    "station_id string, scraped_at timestamp, num_bikes_available int, "
    "delta int"
)
STATE_SCHEMA = "last_ts timestamp, last_bikes int"


def _delta_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (station_id,) = key
    if state.exists:
        last_ts, last_bikes = state.get
    else:
        last_ts, last_bikes = None, None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    pdf = pd.concat(frames).sort_values("scraped_at")
    deltas = []
    for bikes in pdf["num_bikes_available"]:
        b = int(bikes) if pd.notna(bikes) else 0
        # first observation ever -> delta 0 (reference fillna(0))
        deltas.append(b - last_bikes if last_bikes is not None else 0)
        last_bikes = b
    last_ts = pdf["scraped_at"].iloc[-1]
    state.update((last_ts, last_bikes))
    yield pd.DataFrame(
        {
            "station_id": station_id,
            "scraped_at": pdf["scraped_at"],
            "num_bikes_available": pdf["num_bikes_available"],
            "delta": deltas,
        }
    )


def stateful_lag_delta(status):
    """status: streaming frame with station_id/scraped_at/
    num_bikes_available. Returns the per-station delta stream."""
    return (
        status.select("station_id", "scraped_at", "num_bikes_available")
        .groupBy("station_id")
        .applyInPandasWithState(
            _delta_fn,
            outputStructType=DELTA_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
