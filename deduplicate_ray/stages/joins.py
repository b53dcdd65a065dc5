"""Join primitives (J1-J3 analogs).

Physical strategies:

* **broadcast semi/anti join** — the key set is ``ray.put`` once and probed
  with the vectorized ``pc.is_in`` kernel inside ``map_batches`` (no
  shuffle; the reference's dict-probe ``full_path in dupe_files``,
  ``deduplicate.py:133-148``, distributed). Used whenever the key side fits
  (``broadcast_limit`` keys). The Arrow value-set is built once per worker
  process and cached (keyed by the broadcast ref), so per-batch cost is one
  C++ hash-probe pass — no per-row Python.
* **bucketed hash join** (:func:`bucket_join`) — the portable partitioned
  hash join: add ``_bucket = hash(key) % B`` to both sides, sort-shuffle on
  the bucket, and run Arrow's C++ hash join (``pa.Table.join``) per bucket
  inside ``map_groups``. B = ``num_buckets``; each group is a whole bucket,
  so the per-group Python overhead is O(B), not O(keys). Every tagged block
  and every merged block is cast to ONE explicit ``pyarrow.Schema``, so the
  union never mixes block schemas (the round-1 "different schema RefBundle"
  / "Failed to hash the schemas" warnings came from pandas-merge outputs
  whose dtypes drifted per bucket — e.g. int64 → float64 when a left-join
  bucket had misses).

``Dataset.join`` (Ray 2.49) is deliberately NOT used: sort-based aggregates
in this version emit zero-column empty blocks which the hash-shuffle join's
pyarrow/acero step rejects ("No match ... for key field on right side"), and
empty blocks bypass ``map_batches`` so they cannot be repaired in-stream.
The bucketed join sidesteps the block-layout issue entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count

DEFAULT_BROADCAST_LIMIT = 2_000_000

# 16-byte key for pandas' siphash — fixed so bucket assignment is stable
# across processes and Ray task retries (PYTHONHASHSEED-independent).
_HASH_KEY = "dedup_ray_join_0"


def stable_hash(values: np.ndarray | pd.Series) -> np.ndarray:
    """Deterministic vectorized uint64 hash of an int/string array
    (pandas siphash with a pinned key; C-speed, process-stable)."""
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    if len(values) == 0:   # hash_array chokes on some empty dtypes ('U#')
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(values, hash_key=_HASH_KEY, categorize=False)


# --------------------------------------------------------------------------
# broadcast semi / anti joins
# --------------------------------------------------------------------------

# per-worker-process cache of materialized Arrow value-sets, keyed by the
# broadcast ObjectRef hex (bounded: several concurrent broadcast joins may
# share a worker)
_PROBE_CACHE: dict = {}
_PROBE_CACHE_MAX = 8


def _cached_value_set(ref) -> pa.Array:
    key = ref.hex()
    vs = _PROBE_CACHE.get(key)
    if vs is None:
        if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.clear()
        v = ray.get(ref)
        if not isinstance(v, pa.Array):     # accept list or arrow payloads
            v = pa.array(v)
        vs = _PROBE_CACHE.setdefault(key, v)
    return vs


def _broadcast_filter(ds: rd.Dataset, keys: list, col: str, keep: bool) -> rd.Dataset:
    if not keys:
        # empty key set: semi-join keeps nothing, anti-join keeps everything
        # (and pa.array([]) would be null-typed, breaking is_in)
        if keep:
            return ds.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")
        return ds
    ref = ray.put(list(keys))

    def probe(batch: pa.Table) -> pa.Table:
        vs = _cached_value_set(ref)
        mask = pc.fill_null(pc.is_in(batch.column(col), value_set=vs), False)
        return batch.filter(mask if keep else pc.invert(mask))

    return ds.map_batches(probe, batch_format="pyarrow")


def distinct_keys(keys_ds: rd.Dataset, col: str) -> rd.Dataset:
    """Distributed distinct of one column (groupby shuffle, no driver
    materialization — unlike ``Dataset.unique`` which returns a list)."""
    return keys_ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="_n")
    ).select_columns([col])


def default_num_buckets() -> int:
    """Cluster-aware join fan-out: ~2 buckets per cluster CPU, floor 16,
    cap 4096. A fixed B means one bucket = dataset/B inside ONE Arrow join
    task regardless of cluster size (the round-1 scale flaw); tying B to
    the cluster keeps the per-task share roughly constant as nodes are
    added. For inputs much larger than cluster memory, override with
    ``num_buckets ≈ total_bytes / target_bucket_bytes`` instead."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no Ray session yet
        cpus = 8
    return min(4096, max(16, 2 * cpus))


def _try_broadcast_keys(keys_ds: rd.Dataset, col: str, limit: int):
    """Fetch up to limit+1 keys in ONE execution (``take`` short-circuits);
    returns the key list if it fits the broadcast budget, else None."""
    rows = keys_ds.select_columns([col]).take(limit + 1)
    if len(rows) > limit:
        return None
    return [r[col] for r in rows]


def semi_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int | None = None) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` appears in ``keys_ds[col]``."""
    keys = _try_broadcast_keys(keys_ds, col, broadcast_limit)
    if keys is not None:
        return _broadcast_filter(ds, keys, col, keep=True)
    return bucket_join(ds, distinct_keys(keys_ds, col), on=col, how="inner",
                       num_buckets=num_partitions)


def anti_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int | None = None) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` does NOT appear in ``keys_ds[col]``
    (the reference's ``remaining_dupes = all - reviewed`` subtraction,
    ``deduplicate.py:593-631``)."""
    keys = _try_broadcast_keys(keys_ds, col, broadcast_limit)
    if keys is not None:
        return _broadcast_filter(ds, keys, col, keep=False)
    marked = distinct_keys(keys_ds, col).map_batches(
        lambda t: t.append_column("_present", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow")
    joined = bucket_join(ds, marked, on=col, how="left",
                         num_buckets=num_partitions)
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("_present"))).drop_columns(["_present"]),
        batch_format="pyarrow")


# --------------------------------------------------------------------------
# bucketed hash join
# --------------------------------------------------------------------------

def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized stable bucket assignment for a key column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False)
    h = stable_hash(vals)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def _to_arrow_type(t) -> pa.DataType:
    """Ray Schema types may be pyarrow DataTypes, numpy dtypes, or plain
    Python classes depending on the block format lineage — normalize."""
    if isinstance(t, pa.DataType):
        return t
    py_map = {str: pa.string(), int: pa.int64(), float: pa.float64(),
              bool: pa.bool_(), bytes: pa.binary()}
    if t in py_map:
        return py_map[t]
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def _carries_payload(schema) -> bool:
    """True when a relation looks content-bearing: a ``content`` column or
    any (large-)binary / large-string column. Guards the exchange invariant
    that only NARROW relations ride the eager raw-task exchange (which
    pins the whole shuffled relation in the object store, no
    backpressure)."""
    for n, t in zip(schema.names, schema.types):
        if n == "content":
            return True
        at = _to_arrow_type(t)
        if (pa.types.is_binary(at) or pa.types.is_large_binary(at)
                or pa.types.is_large_string(at)):
            return True
    return False


def bucket_join(left: rd.Dataset, right: rd.Dataset, on: str,
                how: str = "inner",
                num_buckets: int | None = None,
                streaming: bool | None = None) -> rd.Dataset:
    """Equi-join two datasets on one key column.

    ``how``: 'inner' or 'left'. Non-key column names must be disjoint
    (rename upstream). Result column order: left columns then right value
    columns; result schema is pinned (identical for every output block).
    The shuffle key is ``hash(key) % num_buckets``; the default is
    cluster-aware (:func:`default_num_buckets`). Salt upstream if one key
    dominates.

    ``streaming``: route the shuffle through Ray Data's sort-based
    ``groupby.map_groups`` (backpressured, spills) instead of the eager
    raw-task exchange (faster, but pins the whole relation in the object
    store). Default ``None`` auto-detects: content-bearing schemas (see
    :func:`_carries_payload`) take the streaming path so a semi/anti-join
    fallback over a content corpus can never pin the payload whole.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    if num_buckets is None:
        num_buckets = default_num_buckets()
    left_schema = left.schema()
    right_schema = right.schema()
    lcols = list(left_schema.names)
    rcols = [c for c in right_schema.names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"bucket_join column collision: {sorted(overlap)}")
    rtypes = {n: _to_arrow_type(t)
              for n, t in zip(right_schema.names, right_schema.types)}
    ltypes = {n: _to_arrow_type(t)
              for n, t in zip(left_schema.names, left_schema.types)}
    # the key column must hash identically on both sides → one pinned type
    key_type = ltypes[on]
    rtypes[on] = key_type
    all_cols = lcols + rcols

    # ONE schema for every tagged block (both sides) and one for the output:
    # byte-identical schemas are what keep the union/map_groups pipeline free
    # of mixed-schema RefBundles.
    tagged_schema = pa.schema(
        [(c, ltypes.get(c, rtypes.get(c))) for c in all_cols]
        + [("_side", pa.int8()), ("_bucket", pa.int32())])
    out_schema = pa.schema([(c, ltypes.get(c, rtypes.get(c))) for c in all_cols])

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t.column(c).cast(ltypes[c]) for c in lcols] + [
            pa.nulls(n, rtypes[c]) for c in rcols]
        arrays.append(pa.array(np.zeros(n, dtype=np.int8)))
        arrays.append(_bucket_of(t.column(on).cast(key_type), num_buckets))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = []
        for c in all_cols:
            if c == on or c in rcols:
                arrays.append(t.column(c).cast(rtypes[c]))
            else:
                arrays.append(pa.nulls(n, ltypes[c]))
        arrays.append(pa.array(np.ones(n, dtype=np.int8)))
        arrays.append(_bucket_of(t.column(on).cast(key_type), num_buckets))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    join_type = "inner" if how == "inner" else "left outer"

    def merge(g: pa.Table) -> pa.Table:
        # Arrow's C++ hash join per bucket: type-preserving (left-join nulls
        # stay typed), no pandas round trip.
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return out_schema.empty_table()
        lmask = pc.equal(g.column("_side"), 0)
        # pin side types before the C++ join: blocks that crossed a sort
        # shuffle or a pandas round trip can degrade all-null columns to
        # null type, which acero rejects as a non-key field (cast is a
        # no-op when types already match)
        lpart = g.filter(lmask).select(lcols).cast(
            pa.schema([(c, ltypes[c]) for c in lcols]))
        rpart = g.filter(pc.invert(lmask)).select([on] + rcols).cast(
            pa.schema([(c, rtypes[c]) for c in [on] + rcols]))
        out = lpart.join(rpart, keys=on, join_type=join_type)
        return out.select(all_cols).cast(out_schema)

    if streaming is None:
        streaming = _carries_payload(left_schema) or \
            _carries_payload(right_schema)
    if streaming:
        # backpressured sort-shuffle: slower than the exchange but never
        # holds the full (content-bearing) relation pinned in the store
        return u.groupby("_bucket").map_groups(merge, batch_format="pyarrow")

    # raw-task hash exchange on the precomputed bucket id (stages.exchange):
    # a sort-based groupby would order both tagged sides globally just to
    # co-locate buckets
    from deduplicate_ray.stages.exchange import exchange

    def part_fn(t: pa.Table) -> np.ndarray:
        return t.column("_bucket").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    return exchange(u, part_fn, merge, num_buckets)
