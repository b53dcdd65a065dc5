"""Line-level duplicate analysis: hot-line census and boilerplate-line
stripping (the StarCoder/SantaCoder-style per-line dedup pass).

Code corpora share enormous numbers of identical LINES across files —
license headers, auto-generated banners, `import` blocks. This stage
finds lines occurring in ≥ ``min_docs`` distinct documents and strips
them, generalizing the reference's file-level collision census
(``/root/reference/dupe_analysis.py:393-407``) to line granularity.

Semantics (pinned, SQL-expressible — see tests/test_lines.py for the
DuckDB statements): a doc's lines are ``text.split('\n')``; identity is
the whitespace-TRIMMED line; lines that trim to empty are never counted
and never stripped; hotness counts DISTINCT docs (a line repeated in
one file counts once); stripping preserves the original (untrimmed)
surviving lines and their order, re-joined with ``'\n'``.

Scale: the census shuffles a narrow ``(line, partial_count)`` relation
with map-side combining — bounded by distinct lines per batch, not
total lines. The hot set (lines in ≥K docs) is orders of magnitude
smaller than the line universe and broadcasts as a sorted int64 hash
array; the strip pass is map-only over the corpus. A hot set past the
broadcast budget would need the semi-join path (same shape as
``decontam``); at a StarCoder-like threshold the hot set is small by
construction, so that fallback is deliberately not built until needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from deduplicate_ray.stages import joins


def _exploded(t: pa.Table, id_col: str, text_col: str,
              delimiter: str = "\n"
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized unit explode: (doc_idx, original_units, trimmed_units)
    as numpy object arrays; doc_idx indexes into the batch.
    ``delimiter`` picks the dedup granularity: "\n" = lines (default),
    "\n\n" = paragraphs (the CCNet/RefinedWeb-style paragraph pass) —
    any literal separator works, the split is one C++ kernel either way."""
    lines_list = pc.split_pattern(
        pc.fill_null(t.column(text_col).cast(pa.string()), ""),
        pattern=delimiter)
    if isinstance(lines_list, pa.ChunkedArray):
        lines_list = lines_list.combine_chunks()
    flat = pc.list_flatten(lines_list)
    lens = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    trimmed = pc.utf8_trim_whitespace(flat)
    return (doc_idx,
            np.asarray(flat.to_pylist(), dtype=object),
            np.asarray(trimmed.to_pylist(), dtype=object))


def line_counts(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text", min_docs: int = 2,
                delimiter: str = "\n") -> rd.Dataset:
    """Hot-unit census: ``(line, n_docs)`` for every trimmed non-empty
    unit occurring in ≥ ``min_docs`` distinct docs (units = lines by
    default; pass ``delimiter="\n\n"`` for paragraphs)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        doc_idx, _, trimmed = _exploded(t, id_col, text_col, delimiter)
        keep = trimmed != ""
        doc_idx, trimmed = doc_idx[keep], trimmed[keep]
        if doc_idx.size == 0:
            return pa.schema([("line", pa.string()),
                              ("n", pa.int64())]).empty_table()
        # per-doc distinct (a doc lives in one batch), then local combine
        h = joins.stable_hash(trimmed).view(np.int64)
        order = np.lexsort((h, doc_idx))
        doc_idx, trimmed, h = doc_idx[order], trimmed[order], h[order]
        uniq = np.ones(doc_idx.size, dtype=bool)
        uniq[1:] = (doc_idx[1:] != doc_idx[:-1]) | (h[1:] != h[:-1])
        df = pd.DataFrame({"line": trimmed[uniq]})
        agg = df.groupby("line", sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(
            agg, schema=pa.schema([("line", pa.string()),
                                   ("n", pa.int64())]),
            preserve_index=False).replace_schema_metadata(None)

    partials = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    counts = partials.groupby("line").aggregate(
        Sum("n", alias_name="n_docs"))
    return counts.filter(expr=f"n_docs >= {int(min_docs)}")


def strip_hot_lines(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", min_docs: int = 2,
                    delimiter: str = "\n") -> rd.Dataset:
    """Remove every unit (line / paragraph per ``delimiter``) whose
    trimmed form occurs in ≥ ``min_docs`` distinct docs; other columns
    pass through, ``text_col`` is rewritten (possibly to ``''`` when
    every unit was boilerplate); survivors re-join with ``delimiter``."""
    hot_rows = line_counts(ds, id_col, text_col, min_docs,
                           delimiter).take_all()
    hot_h = np.sort(np.unique(joins.stable_hash(np.asarray(
        [r["line"] for r in hot_rows], dtype=object)).view(np.int64))) \
        if hot_rows else np.zeros(0, dtype=np.int64)
    hot_ref = ray.put(hot_h)

    def strip(t: pa.Table) -> pa.Table:
        hh = ray.get(hot_ref)
        doc_idx, orig, trimmed = _exploded(t, id_col, text_col, delimiter)
        if doc_idx.size:
            h = joins.stable_hash(trimmed).view(np.int64)
            pos = np.searchsorted(hh, h)
            is_hot = np.zeros(h.size, dtype=bool)
            if hh.size:
                in_range = pos < hh.size
                is_hot[in_range] = hh[pos[in_range]] == h[in_range]
            is_hot &= trimmed != ""     # empty lines are never stripped
            keep = ~is_hot
            joined = pd.Series(orig[keep]).groupby(
                doc_idx[keep], sort=True).agg(delimiter.join)
            texts = np.full(t.num_rows, "", dtype=object)
            texts[joined.index.to_numpy()] = joined.to_numpy()
        else:
            texts = np.full(t.num_rows, "", dtype=object)
        i = t.schema.get_field_index(text_col)
        return t.set_column(i, text_col, pa.array(texts, pa.string()))

    return ds.map_batches(strip, batch_format="pyarrow")
