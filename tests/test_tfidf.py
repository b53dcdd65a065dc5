"""TF-IDF top-k and grouped count-distinct vs DuckDB, plus
broadcast-vs-bucketed plan parity for tfidf_topk."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from deduplicate_ray.stages import stats, tfidf

TFIDF_SQL = r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\s+'),
               x -> x <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df
           FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, term, tf, tf * ln(CAST(n AS DOUBLE) / df) AS score
    FROM tf JOIN df USING (term), n
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) <= {k}
"""


def _corpus() -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(7))
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(120):
        n = int(rng.integers(3, 30))
        words = rng.choice(vocab, size=n,
                           p=np.arange(40, 0, -1) / np.arange(40, 0, -1).sum())
        # mixed case + odd whitespace exercise the tokenizer pinning
        text = "  " + " ".join(w.upper() if i % 7 == 0 else w
                               for i, w in enumerate(words)) + "\t"
        rows.append({"doc_id": d, "text": text})
    rows.append({"doc_id": 120, "text": ""})          # empty doc: no output
    return pd.DataFrame(rows)


def _want(df: pd.DataFrame, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(TFIDF_SQL.format(k=k)).df() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["doc_id", "term"]).reset_index(drop=True)


def test_tfidf_topk_matches_duckdb():
    df = _corpus()
    got = _canon(tfidf.tfidf_topk(
        rd.from_pandas(df).repartition(5), k=3).to_pandas())
    want = _want(df, 3)
    assert len(want) > 300
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tfidf_bucketed_path_matches_broadcast():
    df = _corpus()
    ds = rd.from_pandas(df).repartition(5)
    fast = _canon(tfidf.tfidf_topk(ds, k=3).to_pandas())
    slow = _canon(tfidf.tfidf_topk(ds, k=3, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(slow, fast, check_dtype=False)


def test_count_distinct_matches_duckdb():
    rng = np.random.Generator(np.random.PCG64(11))
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], size=2000),
        "k2": rng.integers(0, 4, size=2000),
        "v": rng.integers(0, 50, size=2000)})
    got = stats.count_distinct(
        rd.from_pandas(df).repartition(6), ["k1", "k2"], "v") \
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT k1, k2, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct
        FROM t GROUP BY 1, 2 ORDER BY k1, k2""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tfidf_bucketed_path_preserves_string_ids():
    df = _corpus()
    df["doc_id"] = "doc-" + df["doc_id"].astype(str)
    ds = rd.from_pandas(df).repartition(4)
    fast = _canon(tfidf.tfidf_topk(ds, k=2).to_pandas())
    slow = _canon(tfidf.tfidf_topk(ds, k=2, broadcast_limit=0).to_pandas())
    assert fast.doc_id.dtype == slow.doc_id.dtype == object
    pd.testing.assert_frame_equal(slow, fast, check_dtype=False)
