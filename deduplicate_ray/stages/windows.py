"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows (SURVEY §2.9); the batch re-expression
treats events as a partitioned log: partition by key, assign each row its
tumbling window start, and aggregate with one ``groupby`` — semantically
identical to ``GROUP BY key, time_bucket(ts)`` for complete (non-late) data.
Ordering assumption: none needed for tumbling aggregates (they are
order-insensitive); sessionization sorts within each key group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum


def add_tumbling_window(events: rd.Dataset, interval_s: int = 3600,
                        ts_col: str = "ts") -> rd.Dataset:
    """Append ``window_start`` (timestamp floored to the interval)."""
    us = interval_s * 1_000_000

    def f(batch: pa.Table) -> pa.Table:
        # normalize to µs first — inputs arrive as timestamp[ns] from pandas
        # lineages and timestamp[us] from parquet
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        floored = pc.multiply(pc.divide(ts, us), us)  # integer division
        return batch.append_column(
            "window_start", floored.cast(pa.timestamp("us")))

    return events.map_batches(f, batch_format="pyarrow")


def tumbling_aggregate(events: rd.Dataset, interval_s: int = 3600,
                       key_col: str = "user_id",
                       value_col: str = "value") -> rd.Dataset:
    """Per (key, window): event count and value sum — the windowed
    aggregate. One shuffle on the composite key."""
    win = add_tumbling_window(events, interval_s)
    agg = win.select_columns([key_col, "window_start", value_col]) \
        .groupby([key_col, "window_start"]).aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="value_sum"))
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("value_sum"), "value_sum",
            pc.round(t.column("value_sum"), ndigits=4)),
        batch_format="pyarrow")


def hopping_aggregate(events: rd.Dataset, window_s: int = 3600,
                      hop_s: int = 900, key_col: str = "user_id",
                      value_col: str = "value") -> rd.Dataset:
    """Hopping (sliding) windows: length ``window_s``, advancing every
    ``hop_s`` (must divide the window). An event at time t belongs to the
    ``window_s/hop_s`` windows whose start lies in ``(t - window, t]`` —
    the replication is a vectorized ``np.repeat`` inside ``map_batches``
    (rows × window/hop, still a narrow (key, start, value) relation),
    then ONE groupby aggregates all windows. Output per (key,
    window_start): event count and value sum."""
    if window_s % hop_s:
        raise ValueError(f"hop_s must divide window_s, got {hop_s}/{window_s}")
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000
    win_us = window_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        val = batch.column(value_col).to_numpy(zero_copy_only=False)
        n = len(ts)
        # newest containing window starts at floor(t/hop)*hop; the k-1
        # earlier hops may fall out of (t - window, t] only when t is
        # exactly on a hop boundary — the filter below handles it exactly
        base = (ts // hop_us) * hop_us
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, n)
        rts = np.repeat(ts, k)
        keep = starts > rts - win_us
        starts, rts = starts[keep], rts[keep]
        return pa.table({
            key_col: pa.array(np.repeat(key, k)[keep]),
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            value_col: pa.array(np.repeat(val, k)[keep])})

    agg = events.select_columns([key_col, "ts", value_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby([key_col, "window_start"]).aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="value_sum"))
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("value_sum"), "value_sum",
            pc.round(t.column("value_sum"), ndigits=4)),
        batch_format="pyarrow")


def sessionize(events: rd.Dataset, gap_s: int = 1800,
               key_col: str = "user_id", ts_col: str = "ts") -> rd.Dataset:
    """Session windows: per key, sort by ts and split where the gap exceeds
    ``gap_s``. Output: (key, session_id, session_start, session_end,
    n_events). Partitioning assumption: one key's events fit one group."""
    gap_us = gap_s * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        # unit-normalize: pandas datetimes may be ns- or µs-backed
        ts = g[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        new_session = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(new_session) - 1
        out = g.assign(_sid=sid).groupby("_sid").agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "size"))
        out = out.reset_index()
        out[key_col] = g[key_col].iloc[0]
        out["session_id"] = out["_sid"].astype("int64")
        return out[[key_col, "session_id", "session_start", "session_end",
                    "n_events"]]

    return events.select_columns([key_col, ts_col]).groupby(key_col) \
        .map_groups(per_key, batch_format="pandas")
