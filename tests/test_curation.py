"""Curation-operator tests: normalized dedup key, deterministic hash
sampling, per-key caps, exact distributed quantiles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplicate_ray.functions.text import add_normalized
from deduplicate_ray.stages import sampling, stats


def test_add_normalized_matches_duckdb():
    texts = ["  Hello\t\nWORLD  ", "a  b\r\n c", "", " \t ",
             "ünïcode  ÉÀ", "tab\tsep", None, "already clean"]
    got = add_normalized(pa.table({"text": texts})) \
        .column("norm_text").to_pylist()
    con = duckdb.connect()
    want = [con.execute(
        r"SELECT trim(regexp_replace(lower($1), '\s+', ' ', 'g'), ' ')",
        [t]).fetchone()[0] for t in texts]
    assert got == want


def test_hash_sample_deterministic_and_layout_independent():
    ids = np.arange(1000, dtype=np.int64)
    t = pa.table({"doc_id": ids, "lang": ["en"] * 1000})
    one_block = sampling.hash_sample(rd.from_arrow(t), "doc_id", 125)
    many_blocks = sampling.hash_sample(
        rd.from_arrow(t).repartition(7), "doc_id", 125)
    a = sorted(r["doc_id"] for r in one_block.take_all())
    b = sorted(r["doc_id"] for r in many_blocks.take_all())
    assert a == b, "sample must not depend on block layout"
    expect = ids[(ids * 2654435761) % 2**32 % 1000 < 125].tolist()
    assert a == expect
    assert 0.08 < len(a) / 1000 < 0.17, "~12.5% of uniform ids"


def test_per_key_cap_matches_window_oracle():
    rng = np.random.Generator(np.random.PCG64(7))
    n = 2000
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "source": [f"s{int(x)}" for x in rng.integers(0, 12, n)]})
    got = sampling.per_key_cap(
        rd.from_pandas(df).repartition(5), "source", "doc_id", k=50
    ).to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    want = df.sort_values(["source", "doc_id"]) \
        .groupby("source").head(50) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source"]], want[["doc_id", "source"]],
        check_like=True)
    assert (got.groupby("source").size() <= 50).all()


def test_grouped_quantiles_matches_percentile_disc():
    rng = np.random.Generator(np.random.PCG64(11))
    df = pd.DataFrame({
        "lang": [f"l{int(x)}" for x in rng.integers(0, 4, 5000)],
        "n_chars": rng.integers(0, 3000, 5000).astype(np.int64)})
    got = stats.grouped_quantiles(
        rd.from_pandas(df).repartition(6), "lang", "n_chars",
        quantiles=(0.5, 0.9, 0.99)).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute("""
        SELECT lang, COUNT(*) AS n,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
              AS BIGINT) AS p50,
          CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
              AS BIGINT) AS p90,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars)
              AS BIGINT) AS p99
        FROM docs GROUP BY lang ORDER BY lang
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunk_windows_matches_duckdb_and_reconstructs():
    from deduplicate_ray.functions.text import chunk_windows

    texts = ["", None, "short", "x" * 256, "y" * 257,
             "ünïcodé " * 40 + "tail",               # multi-byte chars
             "a" * 1000, "word " * 123]
    ids = list(range(len(texts)))
    size, overlap, stride = 40, 8, 32
    got = chunk_windows(pa.table({"doc_id": ids, "text": texts}),
                        size=size, overlap=overlap).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": texts}))
    want = con.execute(f"""
        WITH t AS (SELECT doc_id, COALESCE(text, '') AS txt
                   FROM documents),
        n AS (SELECT doc_id, txt,
                     CAST(1 + CEIL(GREATEST(length(txt) - {size}, 0)
                                   / {stride}.0) AS BIGINT) AS nc
              FROM t)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               substr(txt, CAST(i * {stride} + 1 AS BIGINT), {size})
                   AS chunk_text
        FROM (SELECT doc_id, txt, unnest(range(0, nc)) AS i FROM n)
        ORDER BY doc_id, chunk_id
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # reconstruction: chunk 0 + the post-overlap tail of every later
    # chunk re-concatenates to the original text
    for i, t in enumerate(texts):
        chunks = got[got.doc_id == i].chunk_text.tolist()
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == (t or "")
