"""Vector-column aggregates: grouped centroids over an embedding column.

No reference analog (the reference has no nested/vector data); this is
the cluster-profiling aggregate an embedding-dedup pipeline runs (a
centroid per label/cluster feeds IVF coarse quantizers — see
``stages/similarity.py`` — and drift monitoring).

Shape: each batch reduces its (#rows × dim) float block to per-key
vector sums with ``np.add.reduceat`` (one pass, no Python per row) and
emits LONG-FORMAT partial rows ``(key, dim, s, n)``; one ``groupby``
over ``(key, dim)`` sums the partials — the exchange carries at most
#keys × dim × #blocks narrow rows, independent of corpus size. The
centroid division happens map-side after the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


def grouped_centroid(ds: rd.Dataset, key_col: str, vec_col: str,
                     ndigits: int = 6) -> rd.Dataset:
    """Per-key mean vector in long format:
    ``(key_col, dim: int64, centroid: double)`` — ``centroid`` rounded
    to ``ndigits`` (float sums are order-dependent in the last ulps;
    rounding pins a comparable value, same convention as the windowed
    ``value_sum`` aggregates)."""

    def partial(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key_col).type
        schema = pa.schema([(key_col, ktype), ("dim", pa.int64()),
                            ("s", pa.float64()), ("n", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        emb = t.column(vec_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if pa.types.is_list(emb.type) or pa.types.is_large_list(emb.type) \
                or pa.types.is_fixed_size_list(emb.type):
            lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
            dims = np.unique(lens)
            if dims.size != 1:
                raise ValueError(f"ragged {vec_col}: lengths {dims[:5]}")
            dim = int(dims[0])
            flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            mat = flat.reshape(t.num_rows, dim)
        else:
            # Ray tensor extension / object column of per-row ndarrays
            arr = emb.to_numpy(zero_copy_only=False)
            try:
                mat = (np.stack(arr)
                       if getattr(arr, "dtype", None) == object
                       else np.asarray(arr)).astype(np.float64)
            except ValueError as e:
                raise ValueError(f"ragged {vec_col}: {e}") from e
            if mat.ndim != 2:
                raise ValueError(f"ragged {vec_col}: shape {mat.shape}")
            dim = mat.shape[1]
        order = np.argsort(keys, kind="stable")
        ks, ms = keys[order], mat[order]
        starts = np.flatnonzero(
            np.r_[True, ks[1:] != ks[:-1]])
        sums = np.add.reduceat(ms, starts, axis=0)
        counts = np.diff(np.r_[starts, ks.size])
        g = starts.size
        return pa.table({
            key_col: pa.array(np.repeat(ks[starts], dim)).cast(ktype),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), g)),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64())})

    partials = ds.select_columns([key_col, vec_col]) \
        .map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby([key_col, "dim"]).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        # half_towards_infinity pins the same tie behavior as SQL ROUND
        # (DuckDB rounds halves away from zero; Arrow's default is
        # half-to-even) so an exactly-representable tie can't flip the
        # oracle value-hash.
        c = pc.round(pc.divide(t.column("s"), pc.cast(t.column("n"),
                                                      pa.float64())),
                     ndigits=ndigits,
                     round_mode="half_towards_infinity")
        return pa.table({key_col: t.column(key_col),
                         "dim": t.column("dim"),
                         "centroid": c})

    return agg.map_batches(finish, batch_format="pyarrow")
