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
