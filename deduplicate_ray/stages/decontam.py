"""Benchmark decontamination: token n-gram overlap between a training
corpus and a held-out evaluation set.

The standard LLM-training hygiene step (published in the GPT-3 and PaLM
reports as 13-gram / 8-gram overlap filtering): a training document is
*contaminated* when it shares at least one n-token gram with any eval
document, where a token is a maximal non-whitespace run and a gram is
the space-joined window of ``n`` consecutive tokens. No reference analog
(the reference stops at whole-file hash equality); this generalizes its
"collision" notion to cross-corpus partial overlap.

Design:

* ``gram_hash_batch`` — the vectorized kernel. Tokens are hashed once
  with the pinned siphash (``joins.stable_hash``); gram hashes are a
  polynomial combination of ``n`` consecutive token hashes computed with
  shifted views over ONE flat token buffer for the whole batch (no
  Python loop over windows), then per-doc deduplicated with a single
  lexsort. Docs shorter than ``n`` tokens contribute no grams.
* eval side: the distinct eval gram relation is tiny next to the
  training corpus (benchmarks are a few thousand docs); when it fits
  ``broadcast_limit`` it is ``ray.put`` ONCE as a sorted uint64 array
  and every train task counts membership with ``np.searchsorted`` —
  no shuffle touches the training corpus. Past the budget the scale
  path emits the narrow ``(id, gram)`` relation and routes through the
  existing ``joins.semi_join`` (broadcast or bucketed hash exchange);
  the wide ``text`` column never rides a shuffle on either path.
* 64-bit gram hashing admits collisions at ~2^-64 per pair — at any
  realistic eval-set size the false-contamination probability is
  negligible, and false positives only *remove* training docs (safe
  direction for decontamination).
* gram hashes cross stage boundaries as **int64 bit-views** of the
  uint64 kernel values: Ray's groupby/shuffle paths round-trip key
  columns through Python ints, which overflow for uint64 > 2^63.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from deduplicate_ray.stages import joins

_POLY = np.uint64(1099511628211)  # FNV prime, same base as minhash rolling


def _flat_tokens(texts: list[str | None]) -> tuple[list[str], np.ndarray]:
    """Whitespace-split every text (maximal non-space runs, empties
    dropped — the semantics of ``regexp_split_to_array(text, '\\s+')``
    plus an empty filter) into one flat token list + per-doc lengths."""
    flat: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        lens[i] = len(toks)
        flat.extend(toks)
    return flat, lens


def gram_hash_batch(texts: list[str | None], n: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT token n-gram hashes for a batch of texts.

    Returns ``(doc_idx, grams)`` — parallel arrays sorted by
    ``(doc_idx, gram)``; ``doc_idx`` indexes into ``texts``.
    """
    flat, lens = _flat_tokens(texts)
    tok_h = joins.stable_hash(np.asarray(flat, dtype=object))
    total = tok_h.size
    n64 = np.uint64(n)  # noqa: F841  (documents the window width)
    if total < n:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64))
    # polynomial combine over shifted views of the flat buffer: one pass
    # per window position, vectorized across every doc in the batch
    acc = np.zeros(total - n + 1, dtype=np.uint64)
    for j in range(n):
        acc = acc * _POLY + tok_h[j: total - n + 1 + j]
    # valid window starts: for doc d with L_d tokens starting at off_d,
    # starts off_d .. off_d + L_d - n (empty when L_d < n)
    k = np.maximum(lens - n + 1, 0)
    off = np.concatenate(([0], np.cumsum(lens)[:-1]))
    m = int(k.sum())
    if m == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64))
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), k)
    base = np.repeat(off, k)
    within = np.arange(m, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(k)[:-1])), k)
    grams = acc[base + within]
    # per-doc distinct: one lexsort then a neighbor-diff mask
    order = np.lexsort((grams, doc_idx))
    doc_idx, grams = doc_idx[order], grams[order]
    keep = np.ones(m, dtype=bool)
    keep[1:] = (doc_idx[1:] != doc_idx[:-1]) | (grams[1:] != grams[:-1])
    return doc_idx[keep], grams[keep]


def doc_grams(ds: rd.Dataset, n: int = 8, id_col: str = "doc_id",
              text_col: str = "text") -> rd.Dataset:
    """Narrow ``(id, gram)`` relation: one row per (doc, distinct gram)."""
    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        doc_idx, grams = gram_hash_batch(texts, n)
        ids = t.column(id_col).take(pa.array(doc_idx, pa.int64()))
        return pa.table({id_col: ids,
                         "gram": pa.array(grams.view(np.int64))})
    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow")


def _distinct_eval_grams(eval_ds: rd.Dataset, n: int, text_col: str
                         ) -> rd.Dataset:
    """Distinct gram hashes of the eval set (per-batch distinct; the
    global distinct happens on the consumer side)."""
    def f(t: pa.Table) -> pa.Table:
        _, grams = gram_hash_batch(t.column(text_col).to_pylist(), n)
        return pa.table(
            {"gram": pa.array(np.unique(grams).view(np.int64))})
    return eval_ds.select_columns([text_col]).map_batches(
        f, batch_format="pyarrow")


def contaminated(train: rd.Dataset, eval_ds: rd.Dataset, n: int = 8,
                 id_col: str = "doc_id", text_col: str = "text",
                 broadcast_limit: int = joins.DEFAULT_BROADCAST_LIMIT
                 ) -> rd.Dataset:
    """Training docs sharing ≥1 token n-gram with the eval set, with the
    count of distinct shared grams: ``(id_col, n_shared_grams)``."""
    ev_rel = _distinct_eval_grams(eval_ds, n, text_col).materialize()
    n_ev = ev_rel.count()
    if n_ev <= broadcast_limit:
        # benchmark-sized eval set: broadcast the sorted gram array once,
        # count membership per train batch — zero shuffles
        ev = np.unique(np.concatenate(
            [b.column("gram").to_numpy(zero_copy_only=False)
             for b in ev_rel.iter_batches(batch_format="pyarrow")]
            or [np.zeros(0, dtype=np.int64)]))
        ev_ref = ray.put(ev)

        def count_hits(t: pa.Table) -> pa.Table:
            ev_arr = ray.get(ev_ref)
            doc_idx, grams = gram_hash_batch(
                t.column(text_col).to_pylist(), n)
            grams = grams.view(np.int64)  # ev is int64-sorted; same dtype
            pos = np.searchsorted(ev_arr, grams)
            hit = (pos < ev_arr.size) & (ev_arr[np.minimum(
                pos, max(ev_arr.size - 1, 0))] == grams) \
                if ev_arr.size else np.zeros(grams.size, dtype=bool)
            cnt = np.bincount(doc_idx[hit], minlength=t.num_rows) \
                .astype(np.int64)
            keep = cnt > 0
            ids = t.column(id_col).filter(pa.array(keep))
            return pa.table({id_col: ids,
                             "n_shared_grams": pa.array(cnt[keep])})
        return train.select_columns([id_col, text_col]).map_batches(
            count_hits, batch_format="pyarrow")
    # scale path: narrow (id, gram) relation through the hash-exchange
    # semi-join, then a small groupby — text never shuffles
    from ray.data.aggregate import Count
    tg = doc_grams(train, n, id_col, text_col)
    shared = joins.semi_join(tg, ev_rel, "gram",
                             broadcast_limit=broadcast_limit)
    return shared.groupby(id_col).aggregate(
        Count(alias_name="n_shared_grams"))


def decontaminate(train: rd.Dataset, eval_ds: rd.Dataset, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_limit: int = joins.DEFAULT_BROADCAST_LIMIT
                  ) -> rd.Dataset:
    """The clean training set: ``train`` minus contaminated docs."""
    bad = contaminated(train, eval_ds, n, id_col, text_col,
                       broadcast_limit).select_columns([id_col])
    return joins.anti_join(train, bad, id_col,
                           broadcast_limit=broadcast_limit)
