"""KMV (k-minimum-values) distinct-count sketch — the approximate
COUNT(DISTINCT) for cardinalities where the exact pair shuffle of
``stats.count_distinct`` is not worth it (e.g. distinct shingles / URLs
per source over 100 TB).

Published construction (Bar-Yossef et al., "Counting distinct elements
in a data stream", RANDOM 2002; the KMV estimator form in Beyer et al.,
SIGMOD 2007): hash every value to a uniform 64-bit integer, keep the k
smallest distinct hashes; if fewer than k distinct hashes exist the
count is EXACT (the sketch simply holds them all); otherwise estimate
``(k - 1) / r_k`` where ``r_k`` is the k-th smallest hash scaled to
(0, 1]. Relative error concentrates at ~1/sqrt(k) (gated by
tests/test_sketch.py).

No reference analog (the reference counts groups exactly in SQLite,
``/root/reference/dupe_analysis.py:393-407``); this is the scale path
beside the exact ``stats.count_distinct``.

Scale shape: each batch reduces to ≤ k hashes per group (map-side
combine); the shuffle moves (group, hash) rows bounded by
#groups × k × #blocks — independent of corpus rows; per-group merge
keeps the k smallest and reads off the estimate. Sketches are
MERGEABLE, so the same code path serves streaming checkpoint merges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduplicate_ray.stages import joins

_TWO64 = float(2 ** 64)


def _kmv_partial(values: np.ndarray, k: int) -> np.ndarray:
    """k smallest distinct uint64 hashes of ``values`` (any dtype
    stable_hash accepts)."""
    h = joins.stable_hash(values)
    h = np.unique(h)            # sorted ascending
    return h[:k]


def _estimate(h: np.ndarray, k: int) -> float:
    """KMV estimate from a merged sorted distinct-hash array."""
    if h.size < k:
        return float(h.size)    # sketch is exhaustive → exact
    # scale the k-th minimum into (0, 1]; +1 keeps it nonzero
    r_k = (float(h[k - 1]) + 1.0) / _TWO64
    return (k - 1) / r_k


def grouped_approx_distinct(ds: rd.Dataset, key_cols: list[str],
                            value_col: str, k: int = 1024,
                            out_col: str = "approx_distinct"
                            ) -> rd.Dataset:
    """Per-key-tuple approximate distinct count of ``value_col``:
    ``(key_cols..., out_col: double)``. Exact whenever a group's true
    cardinality is below ``k``."""
    cols = list(key_cols) + [value_col]

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([(c, t.schema.field(c).type) for c in key_cols]
                           + [("h", pa.uint64())])
        t = t.select(cols).filter(pc.is_valid(t.column(value_col)))
        if t.num_rows == 0:
            return schema.empty_table()
        df = t.to_pandas()
        # fully vectorized per-key k-min: key codes (pandas ngroup), one
        # lexsort by (code, hash), distinct-run mask, rank-within-group
        # < k — no Python loop over keys (NULL values are never counted,
        # SQL COUNT(DISTINCT) semantics)
        codes = df.groupby(key_cols, sort=False, dropna=False) \
            .ngroup().to_numpy()
        h = joins.stable_hash(df[value_col].to_numpy())
        order = np.lexsort((h, codes))
        c_s, h_s = codes[order], h[order]
        uniq = np.ones(c_s.size, dtype=bool)
        uniq[1:] = (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])
        keep_idx = order[uniq]
        c_u = c_s[uniq]
        starts = np.flatnonzero(np.r_[True, c_u[1:] != c_u[:-1]])
        sizes = np.diff(np.r_[starts, c_u.size])
        rank = np.arange(c_u.size) - np.repeat(starts, sizes)
        sel = rank < k
        rows = pa.array(keep_idx[sel], pa.int64())
        arrays = [t.column(c).take(rows).combine_chunks()
                  .cast(schema.field(c).type) for c in key_cols]
        arrays.append(pa.array(h_s[uniq][sel], pa.uint64()))
        return pa.Table.from_arrays(arrays, schema=schema)

    sketch_rows = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["h"].to_numpy(dtype=np.uint64))[:k]
        out = g.iloc[:1][list(key_cols)].copy()
        out[out_col] = _estimate(h, k)
        return out

    return sketch_rows.groupby(list(key_cols)).map_groups(
        merge, batch_format="pandas")


def approx_distinct(ds: rd.Dataset, value_col: str, k: int = 1024) -> float:
    """Global approximate distinct count (driver-merged: each block ships
    ≤ k hashes)."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(_kmv_partial(vals, k), pa.uint64())})

    parts = ds.select_columns([value_col]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    h = np.unique(np.asarray([r["h"] for r in parts], dtype=np.uint64))[:k]
    return _estimate(h, k)


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 64) -> pa.Table:
    """Misra–Gries heavy-hitter summary of ``col``: driver-side Arrow
    table ``(col, est_count)`` sorted by count desc / value asc, plus an
    ``err_bound`` column (one global value) such that
    ``true - err_bound <= est_count <= true``.

    Published construction (Misra & Gries 1982; the mergeable-summaries
    form of Agarwal et al., PODS 2012): each batch reduces to its exact
    value counts, then compresses to <= k entries by subtracting the
    (k+1)-th largest count from all; merging sums matching keys and
    re-compresses. Any value with true frequency > err_bound survives;
    with <= k distinct values per batch and <= k overall the summary is
    EXACT (err_bound 0).

    This is the skew diagnostic behind salting decisions: run it on a
    prospective shuffle key (band hash, dirpath, repo) to find the hot
    keys before committing to a partitioning. Each batch ships <= k+1
    rows; driver state is O(k), independent of corpus size.

    NULL is a real key (a hot null — common in dirty corpora — is
    exactly what a skew probe must surface): null occurrences are
    counted exactly out-of-band (they ride the sentinel row, never
    subject to compression) and appear as a null-valued output row.
    """
    def partial(t: pa.Table) -> pa.Table:
        vtype = t.schema.field(col).type
        if t.num_rows == 0:
            return pa.schema([("v", vtype), ("c", pa.int64()),
                              ("e", pa.int64())]).empty_table()
        column = t.column(col)
        n_null = column.null_count
        valid = t.select([col]).filter(pc.is_valid(column))
        if valid.num_rows:
            vc = valid.group_by(col).aggregate([([], "count_all")])
            vals = vc.column(0)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            cnts = vc.column(1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        else:
            vals = pa.nulls(0, vtype)
            cnts = np.zeros(0, dtype=np.int64)
        err = np.int64(0)
        if len(vals) > k:
            order = np.argsort(cnts)[::-1]
            err = cnts[order[k]]          # (k+1)-th largest
            keep = order[:k][cnts[order[:k]] > err]
            vals = vals.take(pa.array(keep, pa.int64()))
            cnts = cnts[keep] - err
        # sentinel row (v null): e = this batch's decrement, c = this
        # batch's NULL-value count — both summed driver-side without
        # needing batch identity (data rows are never null-valued)
        vals = pa.concat_arrays([vals, pa.nulls(1, vtype)])
        cnts = np.concatenate([cnts, [n_null]])
        errs = np.zeros(len(cnts), dtype=np.int64)
        errs[-1] = err
        return pa.table({"v": vals, "c": pa.array(cnts, pa.int64()),
                         "e": pa.array(errs, pa.int64())})

    rows = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    vals = np.asarray([r["v"] for r in rows if r["v"] is not None],
                      dtype=object)
    cnts = np.asarray([r["c"] for r in rows if r["v"] is not None],
                      dtype=np.int64)
    err_total = int(sum(r["e"] for r in rows if r["v"] is None))
    null_total = int(sum(r["c"] for r in rows if r["v"] is None))
    if vals.size:
        ser = pd.Series(cnts).groupby(pd.Series(vals), sort=False).sum()
        vals = ser.index.to_numpy(dtype=object)
        cnts = ser.to_numpy(dtype=np.int64)
    if vals.size > k:
        order = np.argsort(cnts)[::-1]
        final_err = int(cnts[order[k]])
        keep = order[:k][cnts[order[:k]] > final_err]
        vals, cnts = vals[keep], cnts[keep] - final_err
        err_total += final_err
    if null_total:        # exact, appended after compression (never cut)
        vals = np.concatenate([vals, np.asarray([None], dtype=object)])
        cnts = np.concatenate([cnts, [null_total]])
    out = pd.DataFrame({col: vals, "est_count": cnts})
    out = out.sort_values(["est_count", col], ascending=[False, True],
                          na_position="last").reset_index(drop=True)
    out["err_bound"] = np.int64(err_total)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)
