"""Join primitives (J1-J3 analogs).

Physical strategies:

* **broadcast semi/anti join** — the key set is ``ray.put`` once and probed
  with a set lookup inside ``map_batches`` (no shuffle; the reference's
  dict-probe ``full_path in dupe_files``, ``deduplicate.py:133-148``,
  distributed). Used whenever the key side fits
  (``broadcast_limit`` keys).
* **bucketed hash join** (:func:`bucket_join`) — the portable partitioned
  hash join: add ``_bucket = hash(key) % B`` to both sides, sort-shuffle on
  the bucket, and run a vectorized ``pandas.merge`` per bucket inside
  ``map_groups``. B = ``num_partitions``; each group is a whole bucket, so
  the per-group Python overhead is O(B), not O(keys), and the merge itself
  is C-speed.

``Dataset.join`` (Ray 2.49) is deliberately NOT used: sort-based aggregates
in this version emit zero-column empty blocks which the hash-shuffle join's
pyarrow/acero step rejects ("No match ... for key field on right side"), and
empty blocks bypass ``map_batches`` so they cannot be repaired in-stream.
The bucketed join sidesteps the block-layout issue entirely.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count

DEFAULT_BROADCAST_LIMIT = 2_000_000


# --------------------------------------------------------------------------
# broadcast semi / anti joins
# --------------------------------------------------------------------------

def _broadcast_filter(ds: rd.Dataset, keys: list, col: str, keep: bool) -> rd.Dataset:
    ref = ray.put(set(keys))

    def probe(batch: pa.Table) -> pa.Table:
        keyset = ray.get(ref)
        mask = pa.array([v in keyset for v in batch.column(col).to_pylist()])
        return batch.filter(mask if keep else pc.invert(mask))

    return ds.map_batches(probe, batch_format="pyarrow")


def distinct_keys(keys_ds: rd.Dataset, col: str) -> rd.Dataset:
    """Distributed distinct of one column (groupby shuffle, no driver
    materialization — unlike ``Dataset.unique`` which returns a list)."""
    return keys_ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="_n")
    ).select_columns([col])


def _try_broadcast_keys(keys_ds: rd.Dataset, col: str, limit: int):
    """Fetch up to limit+1 keys in ONE execution (``take`` short-circuits);
    returns the key list if it fits the broadcast budget, else None."""
    rows = keys_ds.select_columns([col]).take(limit + 1)
    if len(rows) > limit:
        return None
    return [r[col] for r in rows]


def semi_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int = 16) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` appears in ``keys_ds[col]``."""
    keys = _try_broadcast_keys(keys_ds, col, broadcast_limit)
    if keys is not None:
        return _broadcast_filter(ds, keys, col, keep=True)
    return bucket_join(ds, distinct_keys(keys_ds, col), on=col, how="inner",
                       num_buckets=num_partitions)


def anti_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int = 16) -> rd.Dataset:
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

def _bucket_of(values: list, num_buckets: int) -> np.ndarray:
    return np.array(
        [zlib.crc32(str(v).encode()) % num_buckets for v in values],
        dtype=np.int32)


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


def bucket_join(left: rd.Dataset, right: rd.Dataset, on: str,
                how: str = "inner", num_buckets: int = 16) -> rd.Dataset:
    """Equi-join two datasets on one key column.

    ``how``: 'inner' or 'left'. Non-key column names must be disjoint
    (rename upstream). Result column order: left columns then right value
    columns. The shuffle key is ``hash(key) % num_buckets`` — size
    ``num_buckets`` to the cluster; salt upstream if one key dominates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
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
    all_cols = lcols + rcols

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t.column(c) for c in lcols] + [
            pa.nulls(n, rtypes[c]) for c in rcols]
        out = pa.Table.from_arrays(arrays, names=all_cols)
        out = out.append_column("_side", pa.array(np.zeros(n, dtype=np.int8)))
        return out.append_column(
            "_bucket", pa.array(_bucket_of(t.column(on).to_pylist(), num_buckets)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = []
        for c in all_cols:
            if c == on or c in rcols:
                arrays.append(t.column(c).cast(rtypes[c] if c in rtypes else ltypes[c]))
            else:
                arrays.append(pa.nulls(n, ltypes[c]))
        out = pa.Table.from_arrays(arrays, names=all_cols)
        out = out.append_column("_side", pa.array(np.ones(n, dtype=np.int8)))
        return out.append_column(
            "_bucket", pa.array(_bucket_of(t.column(on).to_pylist(), num_buckets)))

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g[g["_side"] == 0][lcols]
        rpart = g[g["_side"] == 1][[on] + rcols]
        out = lpart.merge(rpart, on=on, how=how)
        return out[all_cols]

    return u.groupby("_bucket").map_groups(merge, batch_format="pandas")
