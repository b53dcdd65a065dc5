"""Decontamination: kernel semantics, DuckDB parity on messy synthetic
text, and broadcast ≡ scale-path equivalence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deduplicate_ray.stages import decontam


def brute_grams(text, n=8):
    toks = (text or "").split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_gram_hash_batch_matches_brute_force():
    texts = [
        "a b c d e f g h i j",          # 3 grams of 8
        "  leading   and\ttab\nnewline one two three four five six",
        "short doc",                      # < 8 tokens: no grams
        "",                               # empty: no grams
        None,                             # null: no grams
        "a b c d e f g h a b c d e f g h a b c d e f g h",  # repeats dedup
    ]
    doc_idx, grams = decontam.gram_hash_batch(texts, 8)
    counts = np.bincount(doc_idx, minlength=len(texts))
    want = [len(brute_grams(t, 8)) for t in texts]
    assert counts.tolist() == want
    # determinism and batch-layout independence: one doc at a time agrees
    for i, t in enumerate(texts):
        di, g = decontam.gram_hash_batch([t], 8)
        assert sorted(g.tolist()) == sorted(
            grams[doc_idx == i].tolist()), f"doc {i}"


def _messy_corpus():
    """60 docs with messy whitespace; ~a third of the train docs embed a
    contiguous token slice copied from an eval doc (doc_id % 7 == 0), so
    contamination is guaranteed and the rest stays random."""
    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"w{i}" for i in range(30)]
    toks_by_doc = {}
    for d in range(60):
        n = int(rng.integers(2, 40))
        toks_by_doc[d] = rng.choice(vocab, n).tolist()
    for d in range(60):
        if d % 7 and d % 3 == 0 and len(toks_by_doc[d]) >= 2:
            src = toks_by_doc[(d // 7) * 7]  # an eval doc
            take = min(len(src), int(rng.integers(4, 9)))
            at = int(rng.integers(0, len(toks_by_doc[d])))
            toks_by_doc[d] = (toks_by_doc[d][:at] + src[:take]
                              + toks_by_doc[d][at:])
    rows = []
    for d, toks in toks_by_doc.items():
        sep = rng.choice([" ", "  ", "\t", "\n"], len(toks)).tolist()
        rows.append({"doc_id": d,
                     "text": "".join(t + s for t, s in zip(toks, sep))})
    return pd.DataFrame(rows)


def test_contaminated_matches_duckdb():
    df = _messy_corpus()
    ds = rd.from_pandas(df).repartition(5)
    ev = ds.filter(lambda r: r["doc_id"] % 7 == 0)
    tr = ds.filter(lambda r: r["doc_id"] % 7 != 0)
    got = decontam.contaminated(tr, ev, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '') AS w
          FROM documents),
        grams AS (
          SELECT DISTINCT doc_id, array_to_string(w[i : i + 3], ' ') AS gram
          FROM (SELECT doc_id, w,
                       unnest(range(1, greatest(len(w) - 2, 1))) AS i
                FROM toks)),
        ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0)
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        FROM grams g JOIN ev USING (gram)
        WHERE g.doc_id % 7 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id
    """).df()
    assert len(want) > 5, "fixture must produce real contamination"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_scale_path_matches_broadcast_path():
    df = _messy_corpus()
    ds = rd.from_pandas(df).repartition(5)
    ev = ds.filter(lambda r: r["doc_id"] % 7 == 0)
    tr = ds.filter(lambda r: r["doc_id"] % 7 != 0)
    a = decontam.contaminated(tr, ev, n=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = decontam.contaminated(tr, ev, n=4, broadcast_limit=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_decontaminate_removes_exactly_contaminated():
    df = _messy_corpus()
    ds = rd.from_pandas(df).repartition(5)
    ev = ds.filter(lambda r: r["doc_id"] % 7 == 0)
    tr = ds.filter(lambda r: r["doc_id"] % 7 != 0)
    bad = set(r["doc_id"]
              for r in decontam.contaminated(tr, ev, n=4).take_all())
    clean = set(r["doc_id"]
                for r in decontam.decontaminate(tr, ev, n=4).take_all())
    train_ids = set(r["doc_id"] for r in tr.take_all())
    assert clean == train_ids - bad
    assert bad, "fixture must contaminate at least one doc"


def test_empty_eval_set_contaminates_nothing():
    df = _messy_corpus()
    ds = rd.from_pandas(df).repartition(3)
    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}))
    assert decontam.contaminated(ds, empty, n=4).count() == 0
