"""Deterministic sampling and per-key caps for training-data curation.

No reference analog (the reference deduplicates, it never downsamples);
these are the standard corpus-shaping operations a large-scale pipeline
runs right after dedup:

* :func:`hash_sample` — keep a deterministic pseudo-random fraction of
  rows keyed on an integer id column. Pure ``map_batches`` filter (no
  shuffle, no state, trivially 100 TB-safe) and reproducible across runs,
  cluster sizes and block layouts — unlike ``Dataset.random_sample``,
  whose output depends on the RNG stream per block. The hash is plain
  int64 arithmetic (Knuth multiplicative step mod 2^32) so an ANSI-SQL
  oracle can reproduce it exactly.
* :func:`per_key_cap` — keep at most ``k`` rows per key, deterministic
  order (smallest ``order_col`` first): the per-domain / per-source cap
  used to stop one crawler domain from dominating a corpus. Two-level:
  a map-side combine caps every batch locally (the only corpus-sized
  pass, no shuffle of dropped rows), then one groupby over the
  pre-capped relation (≤ k·#keys·#blocks rows) finishes exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Knuth's multiplicative constant; the modulus is 2^32 so the SQL-side
# expression `(id * 2654435761) % 4294967296` stays inside int64 for ids
# below ~2^31 (documented bound; testdata ids are far below it).
_KNUTH = 2654435761
_MOD = 2**32


def hash_sample(ds: rd.Dataset, id_col: str, keep_per_mille: int,
                ) -> rd.Dataset:
    """Keep rows where ``hash(id) % 1000 < keep_per_mille`` — a
    deterministic ~``keep_per_mille/1000`` sample."""
    if not 0 <= keep_per_mille <= 1000:
        raise ValueError(f"keep_per_mille must be 0..1000, got {keep_per_mille}")

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        bucket = (ids * _KNUTH) % _MOD % 1000
        return t.filter(pa.array(bucket < keep_per_mille))

    return ds.map_batches(f, batch_format="pyarrow")


def per_key_cap(ds: rd.Dataset, key_col: str, order_col: str, k: int,
                ) -> rd.Dataset:
    """Keep the ``k`` rows with the smallest ``order_col`` per ``key_col``
    (ties impossible when ``order_col`` is unique; with duplicates the cap
    keeps an arbitrary k of the tied tail — pass a unique column)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def local_cap(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        # vectorized per-batch combine: sort by (key, order), then keep
        # rows whose rank within their key run is < k
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), (order_col, "ascending")])
        t = t.take(idx)
        keys = t.column(key_col).combine_chunks()
        # run-length rank: position minus the start index of the row's run
        change = np.ones(t.num_rows, dtype=bool)
        kn = keys.to_numpy(zero_copy_only=False)
        change[1:] = kn[1:] != kn[:-1]
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(t.num_rows), 0))
        rank = np.arange(t.num_rows) - run_start
        return t.filter(pa.array(rank < k))

    combined = ds.map_batches(local_cap, batch_format="pyarrow")

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(k, order_col)

    return combined.groupby(key_col).map_groups(final_cap)
