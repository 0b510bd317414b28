"""Streaming LOCF gap-fill — the read-side dense grid of
`operators/gapfill.py`, produced incrementally as polls arrive.

A dashboard reading the live status stream has the same problem the
batch gap-fill solves (reference `sql/queries.sql` skips empty
buckets entirely): if a station misses polls, its line chart jumps
across the hole. This operator emits one row per STEP-minute bucket
per station — observed rows as-is, missing buckets filled with the
last observed value (TimescaleDB `locf()`), `filled=true`.

Semantics and their streaming constraints:

* **LOCF only.** Linear interpolation needs the NEXT observation,
  which in append-mode streaming hasn't arrived when the gap row
  must be emitted; the batch operator (`gapfill.hypertable_gapfill`)
  owns the interpolating read, this one owns the live read. Same
  division TimescaleDB makes: `interpolate()` is a query-time
  (batch) feature, continuous views carry step semantics.
* **Fill-on-next-arrival, not on a timer.** Gap rows for
  (t_prev, t_next) are emitted when t_next's poll arrives. A
  processing-time timeout could emit heartbeats sooner, but ties
  output to wall-clock at test/replay time; this form is a pure
  function of the input stream, so replays are byte-identical
  (mirrors `statestore.py`'s determinism discipline).
* **Late/duplicate polls are dropped** (bucket ≤ last emitted):
  append mode cannot retract an already-emitted fill. Within one
  micro-batch the last poll per bucket wins (poll order, same rule
  as the reference's append sequence).

State per station: (last_bucket, last_value) — two fields,
O(|stations|), stream-length independent, exactly like
`stateful.py`'s delta state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: grid step — the reference polls ~every 5 minutes
STEP_MIN = 5

OUT_SCHEMA = (
    "station_id string, bucket timestamp, num_bikes_available int, "
    "filled boolean"
)
STATE_SCHEMA = "last_bucket timestamp, last_bikes int"


def _gapfill_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (station_id,) = key
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    step = pd.Timedelta(minutes=STEP_MIN)
    pdf = pd.concat(frames).sort_values("scraped_at")
    pdf["bucket"] = pdf["scraped_at"].dt.floor(f"{STEP_MIN}min")
    # last poll per bucket wins within the batch
    pdf = pdf.drop_duplicates("bucket", keep="last")
    if state.exists:
        last_bucket, last_bikes = state.get
        last_bucket = pd.Timestamp(last_bucket)
    else:
        last_bucket, last_bikes = None, None
    buckets, values, filled = [], [], []
    for bucket, bikes in zip(pdf["bucket"], pdf["num_bikes_available"]):
        if last_bucket is not None and bucket <= last_bucket:
            continue  # late data: the grid already moved past it
        if last_bucket is not None:
            fill = last_bucket + step
            while fill < bucket:
                buckets.append(fill)
                values.append(last_bikes)
                filled.append(True)
                fill += step
        b = int(bikes) if pd.notna(bikes) else 0
        buckets.append(bucket)
        values.append(b)
        filled.append(False)
        last_bucket, last_bikes = bucket, b
    if not buckets:
        return
    state.update((last_bucket, last_bikes))
    yield pd.DataFrame(
        {
            "station_id": station_id,
            "bucket": buckets,
            "num_bikes_available": values,
            "filled": filled,
        }
    )


def streaming_gapfill(status):
    """status: streaming frame with station_id / scraped_at /
    num_bikes_available. Returns the dense LOCF bucket stream."""
    return (
        status.select("station_id", "scraped_at", "num_bikes_available")
        .groupBy("station_id")
        .applyInPandasWithState(
            _gapfill_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
