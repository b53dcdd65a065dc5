"""Temporal joins: per-key backward as-of join and sliding-window counts.

No reference analog (the reference has no timeline data); these are the
two temporal operators a training-data/eventstream pipeline needs that
Ray Data lacks natively (SURVEY §4.3's custom-operator clause — compose
from map_batches + a hash exchange when the Dataset API can't express
the semantics):

* :func:`asof_join` — for every left row, attach the MOST RECENT right
  row with the same key and ``right.on <= left.on`` (backward,
  inclusive; ANSI ``ASOF LEFT JOIN`` semantics, which the DuckDB oracle
  of ``asof_clicks_purchases`` checks bit-exactly).
* :func:`window_count` — for every left row, the COUNT of right rows
  with the same key in the half-open window
  ``(left.on - window, left.on]`` — the per-entity sliding-window
  feature (purchases in the last hour, requests in the last minute).

Physical plan (shared): tag both sides into ONE pinned schema, union,
hash-exchange on ``hash(by) % B`` (the narrow-relation raw-task shuffle,
``stages/exchange.py``; content-bearing schemas fall back to the
backpressured sort-groupby like ``bucket_join``), then ONE vectorized
kernel per bucket:

* as-of: one C++ sort by ``(by, on, side)`` with right rows first at
  equal timestamps, then a numpy forward-fill of the last right-row
  index, reset at key-run boundaries — no per-key Python, no per-row
  Python; cost O(rows log rows) per bucket.
* window count: right rows and two probe rows per left row (window
  start / window end) merge-sorted into one timeline per key; a single
  ``cumsum`` of right-row indicators read at the probe positions gives
  ``#right <= t`` exactly, and the window count is the difference of
  the two probe reads.

Scale notes: a bucket holds whole keys (all rows of a key land in one
bucket), so skew is bounded by the hottest key — salt upstream if one
entity dominates. The shuffled relation is rows × (key + timestamp +
value cols); select the needed columns before calling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicate_ray.stages.joins import (
    _bucket_of, _carries_payload, _to_arrow_type, default_num_buckets)


def _run_ids(keys: np.ndarray) -> np.ndarray:
    """Dense run id per row of a key array already sorted by key."""
    n = len(keys)
    change = np.ones(n, dtype=bool)
    if n:
        change[1:] = keys[1:] != keys[:-1]
    return np.cumsum(change)


def _tagged_union(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
                  right_cols: list[str], num_buckets: int):
    """Tag both sides into one pinned schema with ``_side``/``_bucket``.

    Left rows carry every left column; right rows carry ``by``, ``on``
    and ``right_cols`` (left columns null). ``_side``: right=0, left=1 —
    so a ``(by, on, _side)`` ascending sort puts right rows BEFORE left
    rows at equal timestamps (backward-inclusive as-of semantics).
    """
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    overlap = set(lcols) & set(right_cols)
    if overlap:
        raise ValueError(f"temporal join column collision: {sorted(overlap)}")
    ltypes = {n: _to_arrow_type(t)
              for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _to_arrow_type(t)
              for n, t in zip(rschema.names, rschema.types)}
    # key and timestamp hash/sort identically on both sides → pinned types
    rtypes[by], rtypes[on] = ltypes[by], ltypes[on]
    all_cols = lcols + list(right_cols)
    tagged_schema = pa.schema(
        [(c, ltypes.get(c, rtypes.get(c))) for c in all_cols]
        + [("_side", pa.int8()), ("_bucket", pa.int32())])

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t.column(c).cast(ltypes[c]) for c in lcols] + [
            pa.nulls(n, rtypes[c]) for c in right_cols]
        arrays.append(pa.array(np.ones(n, dtype=np.int8)))
        arrays.append(_bucket_of(t.column(by).cast(ltypes[by]), num_buckets))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = []
        for c in all_cols:
            if c in (by, on) or c in right_cols:
                arrays.append(t.column(c).cast(rtypes[c]))
            else:
                arrays.append(pa.nulls(n, ltypes[c]))
        arrays.append(pa.array(np.zeros(n, dtype=np.int8)))
        arrays.append(_bucket_of(t.column(by).cast(ltypes[by]), num_buckets))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_types = {c: ltypes.get(c, rtypes.get(c)) for c in all_cols}
    return u, tagged_schema, lcols, out_types


def _route(u: rd.Dataset, merge, num_buckets: int, streaming: bool
           ) -> rd.Dataset:
    if streaming:
        return u.groupby("_bucket").map_groups(merge, batch_format="pyarrow")
    from deduplicate_ray.stages.exchange import exchange

    def part_fn(t: pa.Table) -> np.ndarray:
        return t.column("_bucket").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    return exchange(u, part_fn, merge, num_buckets)


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
              right_cols: list[str],
              num_buckets: int | None = None,
              streaming: bool | None = None) -> rd.Dataset:
    """Backward-inclusive left as-of join.

    Output = every left row plus ``right_cols`` of the latest right row
    with ``right.by == left.by`` and ``right.on <= left.on`` (nulls when
    no such row). ``right_cols`` must not collide with left column names
    (rename upstream); ``by``/``on`` types are pinned from the left side.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    u, tagged_schema, lcols, out_types = _tagged_union(
        left, right, by, on, list(right_cols), num_buckets)
    all_cols = lcols + list(right_cols)
    out_schema = pa.schema([(c, out_types[c]) for c in all_cols])

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return out_schema.empty_table()
        g = g.cast(tagged_schema)
        order = pc.sort_indices(g, sort_keys=[
            (by, "ascending"), (on, "ascending"), ("_side", "ascending")])
        g = g.take(order).combine_chunks()
        side = g.column("_side").to_numpy(zero_copy_only=False)
        keys = g.column(by).to_numpy(zero_copy_only=False)
        n = g.num_rows
        idx = np.arange(n, dtype=np.int64)
        is_right = side == 0
        # forward-fill the index of the last right row, reset per key run
        filled = np.maximum.accumulate(np.where(is_right, idx, -1))
        run = _run_ids(keys)
        valid = filled >= 0
        valid &= run[np.clip(filled, 0, n - 1)] == run
        is_left = ~is_right
        match = np.where(valid[is_left], filled[is_left], -1)
        lpart = g.filter(pa.array(is_left))
        take = pa.array(match, pa.int64(), mask=match < 0)
        arrays = [lpart.column(c) for c in lcols] + [
            g.column(c).take(take) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema) \
            .combine_chunks()

    if streaming is None:
        streaming = _carries_payload(left.schema()) or \
            _carries_payload(right.schema())
    return _route(u, merge, num_buckets, streaming)


def window_count(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
                 window: int, out_col: str = "n_right",
                 num_buckets: int | None = None,
                 streaming: bool | None = None) -> rd.Dataset:
    """Per-left-row count of same-key right rows in
    ``(left.on - window, left.on]``.

    ``window`` is in the raw integer units of ``on`` after an int64 cast
    (microseconds for ``timestamp[us]`` columns). Output = every left
    row plus ``out_col: int64``.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if num_buckets is None:
        num_buckets = default_num_buckets()
    u, tagged_schema, lcols, out_types = _tagged_union(
        left, right, by, on, [], num_buckets)
    out_schema = pa.schema([(c, out_types[c]) for c in lcols]
                           + [(out_col, pa.int64())])

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return out_schema.empty_table()
        g = g.cast(tagged_schema).combine_chunks()
        side = g.column("_side").to_numpy(zero_copy_only=False)
        is_left = side == 1
        lpart = g.filter(pa.array(is_left))
        n_l = lpart.num_rows
        if n_l == 0:
            return out_schema.empty_table()
        keys = g.column(by).to_numpy(zero_copy_only=False)
        ts = g.column(on).combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rk, rt = keys[~is_left], ts[~is_left]
        lk, lt = keys[is_left], ts[is_left]
        # one merged timeline per key: right rows (kind 0) and two probes
        # per left row (kind 1: window start at t-window, window end at t).
        # Probes sort AFTER right rows at equal t, so a cumsum of right
        # indicators read at a probe = #right with r.on <= probe_t — the
        # half-open (lo, hi] count is end_probe - start_probe.
        m = len(rk)
        all_k = np.concatenate([rk, lk, lk])
        all_t = np.concatenate([rt, lt - window, lt])
        kind = np.concatenate([np.zeros(m, np.int8),
                               np.ones(2 * n_l, np.int8)])
        order = np.lexsort((kind, all_t, all_k))
        cum = np.cumsum(kind[order] == 0)
        run = _run_ids(all_k[order])
        # subtract the cumulative right-count at each key run's entry
        first_of_run = np.ones(len(order), dtype=bool)
        first_of_run[1:] = run[1:] != run[:-1]
        run_start = np.maximum.accumulate(
            np.where(first_of_run, np.arange(len(order)), 0))
        base = np.where(run_start > 0, cum[np.maximum(run_start - 1, 0)], 0)
        rel = cum - base
        # scatter probe counts back to their left rows
        probe_pos = np.empty(len(order), dtype=np.int64)
        probe_pos[order] = np.arange(len(order))
        start_cnt = rel[probe_pos[m:m + n_l]]
        end_cnt = rel[probe_pos[m + n_l:]]
        counts = (end_cnt - start_cnt).astype(np.int64)
        arrays = [lpart.column(c) for c in lcols] + [pa.array(counts)]
        return pa.Table.from_arrays(arrays, schema=out_schema) \
            .combine_chunks()

    if streaming is None:
        streaming = _carries_payload(left.schema()) or \
            _carries_payload(right.schema())
    return _route(u, merge, num_buckets, streaming)
