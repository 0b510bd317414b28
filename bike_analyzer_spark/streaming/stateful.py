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


# ---- streaming anomaly detection (EWMA z-score) -------------------

ANOM_SCHEMA = (
    "station_id string, scraped_at timestamp, num_bikes_available int, "
    "zscore double, anomaly boolean"
)
ANOM_STATE_SCHEMA = "mean double, var double, n bigint"

#: EWMA decay and the flag threshold (|z| above -> anomaly)
ALPHA = 0.3
Z_THRESHOLD = 3.0
#: observations before the detector starts flagging (variance primes)
WARMUP = 5


def _anomaly_fn(
    key: tuple,
    pdfs: "Iterator[pd.DataFrame]",
    state: "GroupState",
) -> "Iterator[pd.DataFrame]":
    """Per-station EWMA mean/variance, updated observation-by-
    observation across micro-batches; each value is scored against
    the state BEFORE it updates it (an anomaly must not absorb
    itself into the baseline first). State is three numbers per
    station — O(|stations|), stream-length-independent."""
    (station_id,) = key
    mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    pdf = pd.concat(frames).sort_values("scraped_at")
    zs, flags = [], []
    for bikes in pdf["num_bikes_available"]:
        x = float(bikes) if pd.notna(bikes) else 0.0
        if n >= WARMUP and var > 0:
            z = (x - mean) / (var ** 0.5)
        else:
            z = 0.0
        zs.append(z)
        flags.append(abs(z) > Z_THRESHOLD)
        # EWMA update AFTER scoring
        if n == 0:
            mean = x
        else:
            d = x - mean
            mean += ALPHA * d
            var = (1 - ALPHA) * (var + ALPHA * d * d)
        n += 1
    state.update((mean, var, n))
    yield pd.DataFrame(
        {
            "station_id": station_id,
            "scraped_at": pdf["scraped_at"],
            "num_bikes_available": pdf["num_bikes_available"],
            "zscore": zs,
            "anomaly": flags,
        }
    )


def stateful_anomaly(status):
    """Per-station streaming anomaly flags: EWMA z-score kept as
    cross-batch state (same contract as `stateful_lag_delta`; a
    tumbling window could not carry the baseline across batches)."""
    return (
        status.select("station_id", "scraped_at", "num_bikes_available")
        .groupBy("station_id")
        .applyInPandasWithState(
            _anomaly_fn,
            outputStructType=ANOM_SCHEMA,
            stateStructType=ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
