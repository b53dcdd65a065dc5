"""Token-budget shard packing — lay documents (in id order) into a
virtual concatenated token stream and assign each to the fixed-budget
training shard its START offset falls in: ``shard = floor(prefix / budget)``
where ``prefix`` is the total weight of all lower-id rows.

This is the shard-planning step of a training-data pipeline (which docs
go into which ~N-token output file), and the engine's distributed
PREFIX-SUM primitive: a global running total is the textbook
anti-pattern for a driver loop, so it runs as the classic two-level
scan —

1. bucket rows by contiguous id range (uniform over [min_id, max_id]);
2. per-bucket weight totals via a map-side partial + one tiny groupby
   (``num_buckets`` rows cross the wire — the knob scales with cluster
   size, never with data);
3. driver prefix over the bucket totals (bounded by ``num_buckets``);
4. per-bucket assignment: one ``groupby(bucket).map_groups`` sorts the
   group by id and adds its bucket's global offset to a local cumsum.

Only ``(id, weight, bucket)`` ever shuffles; content stays where it is.
Reference analog: none (the reference plans no output layout; SURVEY §2
closes with the report sink) — this is a beyond-reference curation op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def _bucket_of(ids: np.ndarray, lo: int, hi: int, num_buckets: int) -> np.ndarray:
    span = hi - lo + 1
    b = (ids.astype(np.int64) - lo) * num_buckets // span
    return np.clip(b, 0, num_buckets - 1)


def pack_shards(weighted: rd.Dataset, budget: int, id_col: str = "doc_id",
                weight_col: str = "weight",
                num_buckets: int = 64) -> rd.Dataset:
    """``(id, weight)`` → ``(id, shard)``. Weights must be non-negative
    int64; ids unique. ``budget`` is the per-shard token target: a row
    starting at stream offset p lands in shard ``p // budget`` (rows are
    never split — the budget bounds where a shard STARTS accumulating,
    matching how shard writers cut files on document boundaries).

    Skew note: buckets are uniform id ranges, so a pathological id space
    (all mass in one range) degrades to one big group — acceptable
    because per-group work is a sort + cumsum over (id, weight) only,
    ~16 bytes/row; 100M rows in one bucket is still a 1.6 GB task.
    """
    bounds = weighted.aggregate(Min(id_col), Max(id_col))
    if not bounds or bounds.get(f"min({id_col})") is None:
        # empty input: no rows, no shards — return an empty (id, shard)
        # table with the right schema instead of crashing on the bounds
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "shard": pa.array([], pa.int64())}))
    lo, hi = int(bounds[f"min({id_col})"]), int(bounds[f"max({id_col})"])

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = _bucket_of(np.asarray(ids), lo, hi, num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    bucketed = weighted.map_batches(add_bucket, batch_format="pyarrow")

    # per-bucket totals: map-side partial so only (bucket, partial_sum)
    # rows — at most num_buckets per input block — reach the groupby
    def partial(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        # int64 accumulation (np.bincount(weights=...) sums in float64,
        # exact only below 2^53 — bucket token totals at corpus scale
        # would silently lose precision)
        tot = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(tot, b.astype(np.int64), w.astype(np.int64))
        nz = np.flatnonzero(tot)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "partial": pa.array(tot[nz])})

    totals_rows = bucketed.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("partial", alias_name="total")) \
        .take_all()  # <= num_buckets rows: bounded by the knob, not by N
    totals = np.zeros(num_buckets, dtype=np.int64)
    for r in totals_rows:
        totals[int(r["bucket"])] = int(r["total"])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        w = g[weight_col].to_numpy(dtype=np.int64)
        start = int(offsets[int(g["bucket"].iloc[0])]) + \
            np.cumsum(w) - w
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "shard": start // budget})

    return bucketed.groupby("bucket").map_groups(assign,
                                                 batch_format="pandas")


def shard_manifest(packed: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """``(id, shard)`` → per-shard row counts (the write plan a shard
    writer consumes): one tiny groupby."""
    from ray.data.aggregate import Count
    return packed.groupby("shard").aggregate(Count(alias_name="n_docs"))
