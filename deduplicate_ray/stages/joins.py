"""Semi/anti-join helpers (J1-J3 analogs).

Two physical strategies, picked by key-side cardinality:

* **broadcast** — the key set is ``ray.put`` once and probed with a set
  lookup inside ``map_batches`` (no shuffle; the reference's dict-probe
  ``full_path in dupe_files``, ``deduplicate.py:133-148``, distributed).
* **shuffle join** — ``Dataset.join`` hash-partitioned on the key for key
  sets too large to broadcast (the 100 TB path). Keys are distinct-ed with a
  distributed ``groupby`` first so the inner join cannot multiply rows.

``broadcast_limit`` is the crossover in number of keys; at ~64-byte keys the
default (2M) broadcasts ≤ ~128 MB — comfortably below a worker heap.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count

DEFAULT_BROADCAST_LIMIT = 2_000_000


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


def semi_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int = 16) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` appears in ``keys_ds[col]``."""
    n = keys_ds.count()
    if n <= broadcast_limit:
        keys = [r[col] for r in keys_ds.select_columns([col]).take_all()]
        return _broadcast_filter(ds, keys, col, keep=True)
    return ds.join(distinct_keys(keys_ds, col), join_type="inner",
                   num_partitions=num_partitions, on=(col,))


def anti_join(ds: rd.Dataset, keys_ds: rd.Dataset, col: str,
              broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
              num_partitions: int = 16) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` does NOT appear in ``keys_ds[col]``
    (the reference's ``remaining_dupes = all - reviewed`` subtraction,
    ``deduplicate.py:593-631``)."""
    n = keys_ds.count()
    if n <= broadcast_limit:
        keys = [r[col] for r in keys_ds.select_columns([col]).take_all()]
        return _broadcast_filter(ds, keys, col, keep=False)

    # scale path: left join against distinct keys carrying a presence marker,
    # then drop matched rows.
    marked = distinct_keys(keys_ds, col).map_batches(
        lambda t: t.append_column("_present", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    joined = ds.join(marked, join_type="left_outer",
                     num_partitions=num_partitions, on=(col,))
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t.column("_present"))).drop_columns(["_present"]),
        batch_format="pyarrow",
    )
