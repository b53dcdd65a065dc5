"""Two-stage hash exchange over precomputed partition ids (raw Ray tasks).

Ray Data's ``groupby(col).map_groups`` physical plan is a global SORT —
sample boundaries, sort every block, range-merge — even when the caller
already knows each row's partition id and only needs co-location, not
order. For the narrow LSH relations (band keys, candidate pairs) the sort
is pure overhead: measured 24.5 s for the 6.2M-row pair emit and 14.3 s
for the 3.2M-row edge dedup at 32 cpus, with the useful per-partition
compute an order of magnitude smaller. The driver-side census was worse —
a single-threaded ``np.unique`` over 30M keys (15 s of Amdahl serial time
that caps scaling at every parallelism level).

This module is the classic two-stage shuffle, hand-rolled on raw Ray
tasks (SURVEY §4.3's "only where the Dataset API can't express it"
clause):

* **map** — one task per group of input blocks: compute the partition id
  vector (caller-supplied, vectorized), argsort it, slice the block into
  ``n_parts`` contiguous sub-tables, return them as separate objects so a
  reducer fetches ONLY its slice;
* **reduce** — one task per partition: concatenate its slices from every
  map task and apply the caller's ``reduce_fn``.

Outputs re-enter Ray Data via ``from_arrow_refs`` so downstream stages
keep streaming. The exchanged relation is materialized in the object
store between the stages — callers only route NARROW relations (ints +
file-id strings) through it, never content — and the ``chunk_rows``
reduce mode streams each reduced partition out as bounded chunks, so a
partition bigger than the store spills chunk-by-chunk instead of
failing to allocate one giant object.

Cluster scaling: object count is O(map_tasks × n_parts). ``max_map_tasks``
coalesces input blocks so a 100k-block corpus doesn't create 100k × P
shuffle objects — the same consolidation every production shuffle does.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _as_arrow_block(b) -> pa.Table:
    """Normalize a Ray block: ``to_arrow_refs`` hands back pandas blocks
    verbatim when the producing lineage was a pandas ``map_groups``."""
    if isinstance(b, pa.Table):
        return b
    import pandas as pd
    if isinstance(b, pd.DataFrame):
        return pa.Table.from_pandas(b, preserve_index=False)
    return pa.table(b)


def _split(tbl: pa.Table, part_fn, n_parts: int):
    """One map task: slice ``tbl`` into per-partition sub-tables."""
    if tbl.num_rows == 0:
        # an empty block may be schema-less (select_columns over an empty
        # pandas-lineage block) — don't ask part_fn to read its columns
        out = [tbl] * n_parts
        return out[0] if n_parts == 1 else tuple(out)
    # defensive mod: a pid outside [0, n_parts) would silently drop rows
    # at the searchsorted boundaries below
    pids = np.asarray(part_fn(tbl), dtype=np.int64) % n_parts
    order = np.argsort(pids, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(pids[order], np.arange(n_parts + 1))
    out = [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
           for i in range(n_parts)]
    return out[0] if n_parts == 1 else tuple(out)


def _split_many(part_fn, n_parts: int, *tbls):
    # blocks arrive as positional args so Ray resolves the ObjectRefs
    tbls = [_as_arrow_block(t) for t in tbls]
    live = [t for t in tbls if t.num_rows]
    if len(tbls) == 1:
        tbl = tbls[0]
    elif live:
        tbl = pa.concat_tables(live, promote_options="default")
    else:
        tbl = tbls[0]        # all-empty group: keep a schema-bearing table
    return _split(tbl, part_fn, n_parts)


def _gather(schema_hint: pa.Schema | None, parts) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if live:
        return pa.concat_tables(live) if len(live) > 1 else live[0]
    if schema_hint is not None:
        return schema_hint.empty_table()
    return parts[0]


def _reduce(reduce_fn, schema_hint: pa.Schema | None, *parts: pa.Table
            ) -> pa.Table:
    return reduce_fn(_gather(schema_hint, parts))


def _reduce_stream(reduce_fn, schema_hint: pa.Schema | None,
                   chunk_rows: int, *parts: pa.Table):
    """Generator-task reduce: yield the reduced partition in
    ``chunk_rows``-row chunks so no single output object has to fit the
    object store whole — a band-scale partition streams out (and can
    spill) chunk by chunk instead of failing allocation as one giant
    object. The reduce_fn itself still sees the complete partition (its
    semantic contract); per-task HEAP stays bounded by partition size,
    which n_parts is sized for."""
    out = reduce_fn(_gather(schema_hint, parts))
    if out.num_rows == 0:
        yield out
        return
    for s in range(0, out.num_rows, chunk_rows):
        yield out.slice(s, min(chunk_rows, out.num_rows - s))


def _default_map_tasks() -> int:
    """Map-task budget: ~2 tasks per cluster CPU (enough slots to keep
    every core busy through stragglers) with a floor of 64. Shuffle-object
    count is map_tasks × n_parts, and per-object overhead (~1 ms each for
    serialize + schedule + resolve) dominated the exchange when one map
    task ran per input block: 210 maps × 128 parts = 27k objects cost
    more than the sort shuffle it replaced. 64 × 128 = 8k objects is ~3x
    faster than Ray's sort groupby on the same relation."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        cpus = 32
    return max(64, 2 * cpus)


def exchange(blocks: "list[ray.ObjectRef] | rd.Dataset",
             part_fn: Callable[[pa.Table], np.ndarray],
             reduce_fn: Callable[[pa.Table], pa.Table],
             n_parts: int,
             max_map_tasks: int | None = None,
             chunk_rows: int | None = None) -> rd.Dataset:
    """Hash-exchange ``blocks`` into ``n_parts`` partitions and reduce each.

    ``part_fn``: vectorized ``pa.Table -> int array in [0, n_parts)``.
    ``reduce_fn``: ``pa.Table -> pa.Table`` applied once per partition
    (all rows of a partition in one table). Returns a Dataset over the
    reduced partition tables.

    ``chunk_rows``: when set, reducers are Ray GENERATOR tasks yielding
    the reduced partition in chunks of at most that many rows — the
    spill-aware mode: no single output object has to be allocated whole,
    so a partition larger than the object store streams out under
    spilling instead of failing allocation (see ``_reduce_stream``).
    Downstream blocks are chunk-sized, which also bounds the heap of
    whatever consumes them. Leave ``None`` for one table per partition.

    Executes EAGERLY (the input lineage runs at call time) — callers that
    need laziness must not route through the exchange.
    """
    input_schema: pa.Schema | None = None
    if isinstance(blocks, rd.Dataset):
        ds_in = blocks
        blocks = ds_in.to_arrow_refs()
        # empty-partition schema hint straight from Dataset metadata (the
        # lineage just executed, so this is metadata-only) — avoids pulling
        # a potentially content-sized map-0 slice to the driver, and avoids
        # a zero-column hint when that slice happens to be all-empty
        # schema-less blocks
        try:
            s = ds_in.schema(fetch_if_missing=False)
            base = getattr(s, "base_schema", None)
            if isinstance(base, pa.Schema):
                input_schema = base
        except Exception:
            input_schema = None
    blocks = list(blocks)
    if not blocks:
        return rd.from_arrow(reduce_fn(pa.table({})))

    if max_map_tasks is None:
        max_map_tasks = _default_map_tasks()
    per_map = max(1, -(-len(blocks) // max_map_tasks))
    groups = [blocks[i:i + per_map] for i in range(0, len(blocks), per_map)]
    split = ray.remote(_split_many)
    slice_refs = [
        split.options(num_returns=n_parts if n_parts > 1 else 1).remote(
            part_fn, n_parts, *g)
        for g in groups]
    if n_parts == 1:
        slice_refs = [[r] for r in slice_refs]

    # reducers need an empty-partition schema: prefer the input Dataset's
    # metadata schema (zero fetch); fall back to slice 0 of map 0 (already
    # needed by reducer 0) for raw-ObjectRef callers
    schema_hint = input_schema if input_schema is not None \
        else ray.get(slice_refs[0][0]).schema

    if chunk_rows is not None:
        gen = ray.remote(num_returns="dynamic")(_reduce_stream)
        gen_refs = [
            gen.remote(reduce_fn, schema_hint, int(chunk_rows),
                       *[slice_refs[m][p] for m in range(len(groups))])
            for p in range(n_parts)]
        out_refs = [r for g in ray.get(gen_refs) for r in g]
        return rd.from_arrow_refs(out_refs)
    reduce = ray.remote(_reduce)
    out_refs = [
        reduce.remote(reduce_fn, schema_hint,
                      *[slice_refs[m][p] for m in range(len(groups))])
        for p in range(n_parts)]
    return rd.from_arrow_refs(out_refs)


def _census_split(key_fn, n_parts: int, *tbls):
    """Map task for the key census: project keys, combine locally
    (per-block unique+count), split by key hash."""
    tbls = [_as_arrow_block(t) for t in tbls]
    keys = np.concatenate([np.asarray(key_fn(t), dtype=np.int64)
                           for t in tbls if t.num_rows]) \
        if any(t.num_rows for t in tbls) else np.zeros(0, np.int64)
    uk, cnt = np.unique(keys, return_counts=True)
    pid = (uk.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
    order = np.argsort(pid, kind="stable")
    uk, cnt, pid = uk[order], cnt[order], pid[order]
    bounds = np.searchsorted(pid, np.arange(n_parts + 1))
    out = [(uk[bounds[i]:bounds[i + 1]], cnt[bounds[i]:bounds[i + 1]])
           for i in range(n_parts)]
    return out[0] if n_parts == 1 else tuple(out)


def _census_reduce(min_count: int, *parts):
    """Reduce task: merge per-block partial counts for one key range and
    keep keys whose GLOBAL count reaches ``min_count``."""
    keys = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    if not keys.size:
        return keys, cnts
    uk, inv = np.unique(keys, return_inverse=True)
    tot = np.zeros(uk.size, dtype=np.int64)
    np.add.at(tot, inv, cnts)
    keep = tot >= min_count
    return uk[keep], tot[keep]


def key_census(blocks: "list[ray.ObjectRef] | rd.Dataset",
               key_fn: Callable[[pa.Table], np.ndarray],
               n_parts: int,
               min_count: int = 2,
               max_map_tasks: int | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Distributed exact key census: sorted ``(keys, counts)`` of every key
    whose global count is >= ``min_count``.

    The map stage pre-aggregates per block (unique+count — the map-side
    combine), so shuffle volume is bounded by per-block distinct keys, and
    the reduce stage merges partial counts per key range in parallel. The
    driver only concatenates the (already thresholded) survivors and sorts
    them once — at 30M band keys / 3M multi keys this replaces a 15 s
    single-threaded ``np.unique`` with ~2 s of fully parallel work plus a
    ~0.3 s driver sort.
    """
    if isinstance(blocks, rd.Dataset):
        blocks = blocks.to_arrow_refs()
    blocks = list(blocks)
    if not blocks:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    if max_map_tasks is None:
        max_map_tasks = _default_map_tasks()
    per_map = max(1, -(-len(blocks) // max_map_tasks))
    groups = [blocks[i:i + per_map] for i in range(0, len(blocks), per_map)]
    split = ray.remote(_census_split)
    slice_refs = [
        split.options(num_returns=n_parts if n_parts > 1 else 1).remote(
            key_fn, n_parts, *g)
        for g in groups]
    if n_parts == 1:
        slice_refs = [[r] for r in slice_refs]
    reduce = ray.remote(_census_reduce)
    parts = ray.get([
        reduce.remote(min_count, *[slice_refs[m][p]
                                   for m in range(len(groups))])
        for p in range(n_parts)])
    keys = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    order = np.argsort(keys)
    return keys[order], cnts[order]
