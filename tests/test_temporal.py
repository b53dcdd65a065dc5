"""Temporal join tests: backward as-of join and sliding-window counts
against DuckDB oracles over randomized timelines (equal timestamps,
keys with no right rows, multi-bucket shuffles)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplicate_ray.stages import temporal


def _mk(seed=3, n_left=800, n_right=600, n_keys=25):
    rng = np.random.Generator(np.random.PCG64(seed))
    base = np.datetime64("2024-01-01", "us")
    # coarse second grid so equal-timestamp collisions actually occur
    lts = base + rng.integers(0, 5000, n_left).astype("timedelta64[s]")
    rts = base + rng.integers(0, 5000, n_right).astype("timedelta64[s]")
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype=np.int64),
        "user_id": rng.integers(0, n_keys, n_left).astype(np.int64),
        "ts": lts.astype("datetime64[us]")})
    right = pd.DataFrame({
        "user_id": rng.integers(0, n_keys + 5, n_right).astype(np.int64),
        "ts": rts.astype("datetime64[us]"),
        "rval": rng.random(n_right)})
    # dedupe (user_id, ts) on the right so the as-of match is unique
    right = right.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return left, right


def test_asof_join_matches_duckdb():
    left, right = _mk()
    r2 = right.rename(columns={"rval": "last_val"})
    r2["last_ts"] = r2["ts"]
    got = temporal.asof_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(r2).repartition(3),
        by="user_id", on="ts", right_cols=["last_ts", "last_val"],
        num_buckets=7,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.event_id, l.user_id, l.ts, r.ts AS last_ts,
               r.rval AS last_val
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
        ORDER BY l.event_id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["last_ts"].isna().any(), "fixture must exercise no-match"


def test_asof_equal_timestamp_is_inclusive():
    left = pd.DataFrame({"event_id": [0], "user_id": [1],
                         "ts": pd.to_datetime(["2024-01-01"])})
    right = pd.DataFrame({"user_id": [1],
                          "ts": pd.to_datetime(["2024-01-01"]),
                          "pv": [42.0]})
    got = temporal.asof_join(rd.from_pandas(left), rd.from_pandas(right),
                             by="user_id", on="ts", right_cols=["pv"],
                             num_buckets=2).to_pandas()
    assert got["pv"].tolist() == [42.0]


def test_window_count_matches_duckdb():
    left, right = _mk(seed=9)
    win_us = 600 * 1_000_000  # 10 minutes
    got = temporal.window_count(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right[["user_id", "ts"]]).repartition(3),
        by="user_id", on="ts", window=win_us, out_col="n10m",
        num_buckets=6,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute("""
        SELECT l.event_id, l.user_id, l.ts,
               CAST(COUNT(r.ts) AS BIGINT) AS n10m
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id
         AND r.ts > l.ts - INTERVAL 10 MINUTE AND r.ts <= l.ts
        GROUP BY l.event_id, l.user_id, l.ts
        ORDER BY l.event_id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n10m"] > 0).any() and (got["n10m"] == 0).any()


def test_window_count_streaming_path_matches_exchange_path():
    left, right = _mk(seed=21, n_left=300, n_right=250)
    kwargs = dict(by="user_id", on="ts", window=900_000_000,
                  out_col="n", num_buckets=5)
    a = temporal.window_count(rd.from_pandas(left),
                              rd.from_pandas(right[["user_id", "ts"]]),
                              streaming=False, **kwargs).to_pandas()
    b = temporal.window_count(rd.from_pandas(left),
                              rd.from_pandas(right[["user_id", "ts"]]),
                              streaming=True, **kwargs).to_pandas()
    a = a.sort_values("event_id").reset_index(drop=True)
    b = b.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
