"""TF-IDF top-k terms per document — the inverted-index-shaped profiling
aggregate (keyword extraction / topic tagging) a curation pipeline runs
over a corpus.

No reference analog (the reference, ``/root/reference/dupe_analysis.py``,
only groups whole-file hashes); this generalizes its collision-census
idea (``_generate_hash_sql``, ``dupe_analysis.py:393-407``) from file
hashes to terms: the document-frequency census is exactly a
``GROUP BY term`` count over per-doc distinct terms.

Semantics (pinned by the ``tfidf_topk_docs`` SQL oracle and
tests/test_tfidf.py):

* tokens = maximal non-whitespace runs of ``lower(text)`` (Python
  ``str.split()`` / DuckDB ``regexp_split_to_array('\\s+')`` + empty
  filter — same family as functions/text.py token_count_ws);
* ``tf``   = occurrences of the term in the doc (raw count);
* ``df``   = number of DISTINCT docs containing the term;
* ``score``= tf · ln(N / df), N = total docs (natural log; ``math.log``
  here == libm ``std::log`` in DuckDB — bit-identical doubles);
* output  = top ``k`` terms per doc by ``(score DESC, term ASC)`` —
  the tie order makes the result deterministic on both sides.

Scale shape: the df census shuffles only a narrow ``(term,
partial_count)`` relation with map-side combining (bounded by distinct
terms per batch); the census result is a term→df map that broadcasts
once via ``ray.put`` (vocabulary ≪ corpus: even 100 TB of text has a
~10^8-term vocab ≈ a few GB — within one node; the hash array we ship
is 8 B/term). Scoring + top-k is then MAP-ONLY over the corpus: a doc's
text lives in one row, so its tf vector and its top-k are complete
within the batch — no per-doc shuffle ever happens. Past the broadcast
budget the census joins back via the bucketed hash join and top-k falls
back to a per-doc group pass (``_topk_bucketed``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from deduplicate_ray.stages import joins

_OUT_SCHEMA = pa.schema([("term", pa.string()), ("tf", pa.int64()),
                         ("score", pa.float64())])


def _term_explode(t: pa.Table, text_col: str
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, term) arrays for every token occurrence in the batch;
    vectorized through Arrow's whitespace splitter."""
    text = pc.utf8_lower(
        pc.fill_null(t.column(text_col).cast(pa.string()), ""))
    # NOT utf8_split_whitespace: that kernel (Arrow 16.1) returns corrupt
    # splits on a SLICED input when a prior invocation in the same process
    # ran on a larger array — trailing whitespace survives in the last
    # token (reproduced deterministically; block slices from Ray batching
    # hit it nondeterministically, census vs score passes then disagree).
    # The RE2 splitter is immune; empties are filtered below either way.
    toks = pc.split_pattern_regex(text, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    terms = np.asarray(flat.to_pylist(), dtype=object)
    keep = terms != ""      # leading/trailing whitespace yields empties
    return doc_idx[keep], terms[keep]


def doc_freq(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Document-frequency census: ``(term, df)`` with df = distinct-doc
    count. Map-side combine: each batch emits per-doc-distinct terms
    pre-reduced to (term, partial_count), so the shuffle is bounded by
    per-batch vocabulary, not token count."""
    def partial(t: pa.Table) -> pa.Table:
        doc_idx, terms = _term_explode(t, text_col)
        if doc_idx.size == 0:
            return pa.schema([("term", pa.string()),
                              ("n", pa.int64())]).empty_table()
        df = pd.DataFrame({"d": doc_idx, "term": terms})
        per_doc = df.drop_duplicates()
        agg = per_doc.groupby("term", sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(
            agg[["term", "n"]],
            schema=pa.schema([("term", pa.string()), ("n", pa.int64())]),
            preserve_index=False).replace_schema_metadata(None)

    return ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="df"))


def tfidf_topk(ds: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text", k: int = 3,
               broadcast_limit: int = joins.DEFAULT_BROADCAST_LIMIT
               ) -> rd.Dataset:
    """Top-``k`` TF-IDF terms per doc: ``(id_col, term, tf, score)``."""
    n_docs = ds.count()
    df_rel = doc_freq(ds, text_col).materialize()
    narrow = ds.select_columns([id_col, text_col])
    if df_rel.count() > broadcast_limit:
        return _topk_bucketed(narrow, df_rel, n_docs, id_col, text_col, k)

    rows = df_rel.take_all()
    vocab_h = joins.stable_hash(
        np.asarray([r["term"] for r in rows], dtype=object)).view(np.int64)
    # idf per term via math.log (libm) — the oracle's ln(); one log per
    # VOCAB entry here, never per token
    idf = np.asarray([math.log(n_docs / r["df"]) for r in rows],
                     dtype=np.float64)
    order = np.argsort(vocab_h)
    ref = ray.put((vocab_h[order], idf[order]))

    def score_topk(t: pa.Table) -> pa.Table:
        vh, vidf = ray.get(ref)
        doc_idx, terms = _term_explode(t, text_col)
        if doc_idx.size == 0:
            return _OUT_SCHEMA.insert(
                0, pa.field(id_col, t.schema.field(id_col).type)
            ).empty_table()
        tf = (pd.DataFrame({"d": doc_idx, "term": terms})
              .groupby(["d", "term"], sort=False).size()
              .reset_index(name="tf"))
        h = joins.stable_hash(tf["term"].to_numpy()).view(np.int64)
        pos = np.searchsorted(vh, h)
        pos = np.minimum(pos, max(vh.size - 1, 0))
        # every term is in the census by construction; this guards the
        # hash-lookup (not membership) invariant — explicit raise so the
        # check survives `python -O` (a silent miss would score the term
        # with a neighboring entry's idf)
        if not (vh.size and (vh[pos] == h).all()):
            raise ValueError("tfidf: term missing from idf census")
        score = tf["tf"].to_numpy(np.float64) * vidf[pos]
        # top-k by (score desc, term asc) within each doc
        srt = np.lexsort((tf["term"].to_numpy(), -score,
                          tf["d"].to_numpy()))
        d_s = tf["d"].to_numpy()[srt]
        rank = np.arange(d_s.size) - np.maximum.accumulate(
            np.where(np.r_[True, d_s[1:] != d_s[:-1]],
                     np.arange(d_s.size), 0))
        keep = srt[rank < k]
        keep = keep[np.argsort(tf["d"].to_numpy()[keep], kind="stable")]
        ids = t.column(id_col).take(
            pa.array(tf["d"].to_numpy()[keep], pa.int64()))
        return pa.table({
            id_col: ids,
            "term": pa.array(tf["term"].to_numpy()[keep], pa.string()),
            "tf": pa.array(tf["tf"].to_numpy()[keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64())})

    return narrow.map_batches(score_topk, batch_format="pyarrow")


def _topk_bucketed(narrow: rd.Dataset, df_rel: rd.Dataset, n_docs: int,
                   id_col: str, text_col: str, k: int) -> rd.Dataset:
    """Scale fallback past the broadcast budget: join the (doc, term, tf)
    relation against the census through the bucketed hash join, then
    re-group by doc for the top-k (one extra narrow shuffle)."""
    from deduplicate_ray.stages.joins import _to_arrow_type
    id_type = _to_arrow_type(dict(zip(narrow.schema().names,
                                      narrow.schema().types))[id_col])

    def tf_rel(t: pa.Table) -> pa.Table:
        doc_idx, terms = _term_explode(t, text_col)
        if doc_idx.size == 0:
            return pa.schema([(id_col, id_type), ("term", pa.string()),
                              ("tf", pa.int64())]).empty_table()
        tf = (pd.DataFrame({"d": doc_idx, "term": terms})
              .groupby(["d", "term"], sort=False).size()
              .reset_index(name="tf"))
        ids = t.column(id_col).take(pa.array(tf["d"].to_numpy(), pa.int64()))
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # the id keeps ITS OWN dtype (string/int32 ids work the same as
        # the broadcast plan; both plans emit identical schemas)
        return pa.table({id_col: ids.cast(id_type),
                         "term": pa.array(tf["term"].to_numpy(), pa.string()),
                         "tf": pa.array(tf["tf"].to_numpy(), pa.int64())})

    rel = narrow.map_batches(tf_rel, batch_format="pyarrow")
    joined = joins.bucket_join(rel, df_rel, on="term")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        score = g["tf"].to_numpy(np.float64) * np.asarray(
            [math.log(n_docs / d) for d in g["df"]], dtype=np.float64)
        g = g.assign(score=score)
        g = g.sort_values(["score", "term"], ascending=[False, True])
        return g.head(k)[[id_col, "term", "tf", "score"]]

    return joined.groupby(id_col).map_groups(topk, batch_format="pandas")
