"""Unit tests for the two-stage hash exchange (stages/exchange.py)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from deduplicate_ray.stages import exchange as ex


def _table(n: int, start: int = 0) -> pa.Table:
    ids = np.arange(start, start + n, dtype=np.int64)
    return pa.table({"k": ids % 7, "v": ids})


def test_exchange_preserves_rows_and_isolates_partitions():
    blocks = [ray.put(_table(100, 0)), ray.put(_table(100, 100)),
              ray.put(_table(37, 200))]
    n_parts = 5

    def part_fn(t):
        return np.asarray(t.column("k")) % n_parts

    seen_parts = []

    def reduce_fn(t: pa.Table) -> pa.Table:
        # each reduce call must see a SINGLE partition: all rows of any
        # key it holds, and no key shared with another call
        ks = set(np.asarray(t.column("k")).tolist())
        seen_parts.append(ks)
        return t

    out = ex.exchange(blocks, part_fn, reduce_fn, n_parts)
    rows = out.take_all()
    assert sorted(r["v"] for r in rows) == list(range(237))
    # partition isolation: every key's pid set is a singleton across calls
    all_keys = {}
    for i, ks in enumerate(seen_parts):
        for k in ks:
            assert all_keys.setdefault(k, i) == i, \
                f"key {k} appeared in two reduce calls"


def test_exchange_out_of_range_pid_is_wrapped_not_dropped():
    blocks = [ray.put(_table(50))]

    def part_fn(t):
        # deliberately exceed n_parts — exchange must mod, not drop
        return np.asarray(t.column("v"))

    out = ex.exchange(blocks, part_fn, lambda t: t, 3)
    assert len(out.take_all()) == 50


def test_exchange_accepts_dataset_and_coalesces_maps():
    ds = rd.from_arrow(_table(500)).repartition(10)
    out = ex.exchange(ds, lambda t: np.asarray(t.column("k")) % 4,
                      lambda t: t, 4, max_map_tasks=3)
    assert sorted(r["v"] for r in out.take_all()) == list(range(500))


def test_exchange_empty_partitions_get_schema():
    # all rows land in partition 0; partitions 1..3 are empty and must
    # still reach reduce_fn with the right schema
    blocks = [ray.put(_table(20))]
    out = ex.exchange(blocks, lambda t: np.zeros(t.num_rows, np.int64),
                      lambda t: t, 4)
    assert out.count() == 20
    assert set(out.schema().names) == {"k", "v"}


def test_key_census_matches_driver_unique():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 300, 5000).astype(np.int64)
    blocks = [ray.put(pa.table({"key": keys[i::4]})) for i in range(4)]

    got_k, got_c = ex.key_census(
        blocks, lambda t: np.asarray(t.column("key")), n_parts=8,
        min_count=2)
    uk, cnt = np.unique(keys, return_counts=True)
    multi = cnt >= 2
    assert np.array_equal(got_k, uk[multi])
    assert np.array_equal(got_c, cnt[multi])


def test_key_census_min_count_and_empty():
    blocks = [ray.put(pa.table({"key": np.array([1, 1, 1, 2, 2, 3],
                                                np.int64)}))]
    k, c = ex.key_census(blocks, lambda t: np.asarray(t.column("key")),
                         n_parts=2, min_count=3)
    assert k.tolist() == [1] and c.tolist() == [3]
    k, c = ex.key_census([], lambda t: None, n_parts=2)
    assert k.size == 0 and c.size == 0


def test_exchange_accepts_pandas_lineage_blocks():
    """to_arrow_refs hands back pandas blocks verbatim when the producing
    lineage was a pandas map_groups (e.g. LSH bridge edges) — the exchange
    must normalize them instead of crashing (the bug that killed the 3.6M
    scaling level)."""
    import pandas as pd

    ds = rd.from_arrow(_table(90))

    def to_pd(g: pd.DataFrame) -> pd.DataFrame:
        return g

    pandas_ds = ds.groupby("k").map_groups(to_pd, batch_format="pandas")
    out = ex.exchange(pandas_ds, lambda t: np.asarray(t.column("k")) % 3,
                      lambda t: t, 3)
    assert sorted(r["v"] for r in out.take_all()) == list(range(90))


def test_exchange_all_empty_map_group():
    """A map group whose blocks are ALL empty must still split cleanly
    (schema-bearing empty table) instead of crashing concat_tables."""
    schema_t = pa.table({"k": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})
    blocks = [ray.put(schema_t), ray.put(schema_t), ray.put(_table(10))]
    out = ex.exchange(blocks, lambda t: np.asarray(t.column("k")) % 2,
                      lambda t: t, 2, max_map_tasks=2)
    assert sorted(r["v"] for r in out.take_all()) == list(range(10))


def test_exchange_chunked_matches_eager():
    """chunk_rows mode: same rows, same partition isolation, but split
    into bounded blocks (no output block larger than chunk_rows)."""
    blocks = [ray.put(_table(100, 0)), ray.put(_table(100, 100)),
              ray.put(_table(37, 200))]
    n_parts = 3

    def part_fn(t):
        return np.asarray(t.column("k")) % n_parts

    out = ex.exchange(blocks, part_fn, lambda t: t, n_parts,
                      chunk_rows=16)
    batches = list(out.iter_batches(batch_format="pyarrow",
                                    batch_size=None))
    assert sorted(v for b in batches
                  for v in b.column("v").to_pylist()) == list(range(237))
    assert all(b.num_rows <= 16 for b in batches)
    assert len(batches) > n_parts  # genuinely chunked


def test_exchange_chunked_streams_past_object_store_capacity():
    """The spill-aware criterion (round-3 verdict #5): with an object
    store SMALLER than one reduced partition, the eager mode would have
    to allocate the partition as one giant object; chunk_rows streams it
    out in store-sized pieces (spilling as needed). Runs in a fresh
    subprocess so the bounded-store ray session doesn't disturb the
    session fixture."""
    import subprocess
    import sys

    child = r"""
import numpy as np, pyarrow as pa, ray
ray.init(num_cpus=2, include_dashboard=False, logging_level="ERROR",
         object_store_memory=120 * 1024 * 1024)
from deduplicate_ray.stages import exchange as ex
# 16 x 12.5MB blocks -> one partition of ~200MB > 120MB store
blocks = []
for i in range(16):
    v = np.arange(i * 1_562_500, (i + 1) * 1_562_500, dtype=np.int64)
    blocks.append(ray.put(pa.table({"v": v})))
out = ex.exchange(blocks, lambda t: np.zeros(t.num_rows, np.int64),
                  lambda t: t, n_parts=1, chunk_rows=1_000_000)
total = n = 0
for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
    total += int(np.asarray(b.column("v")).sum()); n += b.num_rows
assert n == 25_000_000, n
assert total == 25_000_000 * (25_000_000 - 1) // 2, total
print("CHUNKED_OK")
ray.shutdown()
"""
    r = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, timeout=420)
    assert "CHUNKED_OK" in r.stdout, r.stderr[-2000:]
