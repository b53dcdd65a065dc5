"""Exact distributed quantiles over an integer-valued column.

No reference analog; this is the corpus-profiling aggregate a curation
pipeline runs constantly (length percentiles per language/source decide
filter thresholds). Ray Data has no quantile aggregate; a global sort
would be an all-to-all shuffle of the full relation. Instead:

1. map-side combine: each batch reduces to its (group, value) → count
   histogram (``pyarrow.TableGroupBy`` per batch — vectorized);
2. one small ``groupby`` sums the per-batch histograms — the shuffled
   relation is ≤ #groups × #distinct-values rows, independent of corpus
   row count (document lengths at 100 TB still have ~10^5 distinct
   values, so the exchange stays tiny);
3. the driver walks each group's sorted histogram once to read off exact
   ``percentile_disc`` values (smallest value whose cumulative count
   reaches ``ceil(q·n)`` — ANSI/DuckDB inverse-CDF semantics, which the
   SQL oracle of ``doc_length_quantiles`` checks bit-exactly).

Driver state is the histogram, not the data — bounded by distinct-value
count, not corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum


def grouped_quantiles(ds: rd.Dataset, key_col: str, value_col: str,
                      quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                      ) -> pa.Table:
    """Exact per-group ``percentile_disc`` of ``value_col`` (int) for each
    ``q`` in ``quantiles``. Returns a driver-side Arrow table
    ``(key_col, n, p<q*100>...)`` sorted by key."""
    for q in quantiles:
        if not 0 < q <= 1:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")

    def local_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             value_col: pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        g = pa.TableGroupBy(t.select([key_col, value_col]),
                            [key_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, value_col, "cnt"])

    hist = ds.map_batches(local_hist, batch_format="pyarrow") \
        .groupby([key_col, value_col]).aggregate(Sum("cnt", alias_name="cnt"))

    tbl = pa.Table.from_pylist(
        hist.take_all(),
        schema=pa.schema([(key_col, pa.string()), (value_col, pa.int64()),
                          ("cnt", pa.int64())]))
    tbl = tbl.sort_by([(key_col, "ascending"), (value_col, "ascending")])
    keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
    vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
    cnts = tbl.column("cnt").to_numpy(zero_copy_only=False)

    out_keys, out_n = [], []
    out_q: dict[float, list[int]] = {q: [] for q in quantiles}
    i = 0
    while i < len(keys):
        j = i
        while j < len(keys) and keys[j] == keys[i]:
            j += 1
        cum = np.cumsum(cnts[i:j])
        n = int(cum[-1])
        out_keys.append(keys[i])
        out_n.append(n)
        for q in quantiles:
            # percentile_disc: smallest value with cumulative count
            # >= ceil(q * n) (1-based inverse CDF)
            target = max(1, math.ceil(q * n))
            out_q[q].append(int(vals[i + int(np.searchsorted(
                cum, target, side="left"))]))
        i = j

    cols: dict[str, object] = {key_col: pa.array(out_keys, pa.string()),
                               "n": pa.array(out_n, pa.int64())}
    for q in quantiles:
        cols[f"p{round(q * 100)}"] = pa.array(out_q[q], pa.int64())
    return pa.table(cols)


def count_distinct(ds: rd.Dataset, key_cols: list[str], value_col: str,
                   out_col: str = "n_distinct") -> rd.Dataset:
    """Exact grouped COUNT(DISTINCT value_col): one row per key tuple,
    ``(key_cols..., out_col)``.

    Ray Data has no distinct-count aggregate; a naive
    ``groupby(keys).map_groups(nunique)`` would shuffle every row. Shape
    here: (1) map-side distinct — each batch reduces to its distinct
    ``(keys..., value)`` tuples (vectorized ``pyarrow.TableGroupBy``);
    (2) one ``groupby`` over the pair relation makes the tuples globally
    distinct; (3) the pair blocks (already key-clustered by the shuffle)
    pre-count per batch and a final tiny ``groupby`` sums the partials —
    the second exchange moves at most #groups × #blocks rows, not the
    distinct-pair relation.

    NULL ``value_col`` entries are never counted (SQL COUNT(DISTINCT)
    semantics); a key whose values are ALL null yields no output row
    (where full SQL GROUP BY over the base table would emit count 0).
    """
    cols = list(key_cols) + [value_col]

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        # SQL COUNT(DISTINCT v) never counts NULL values
        t = t.filter(pc.is_valid(t.column(value_col)))
        if t.num_rows == 0:
            return t
        return pa.TableGroupBy(t, cols).aggregate([]).select(cols)

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(cols).aggregate(Count(alias_name="_dup"))

    def partial_count(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(cols), list(key_cols)) \
            .aggregate([([], "count_all")])
        return g.rename_columns(list(key_cols) + ["_n"])

    return pairs.map_batches(partial_count, batch_format="pyarrow") \
        .groupby(list(key_cols)).aggregate(Sum("_n", alias_name=out_col))
