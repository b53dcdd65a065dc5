"""Line-level dedup: census and strip vs DuckDB on synthetic multi-line
docs. (The driver ``documents`` testdata contains no newlines — line ops
are covered here at the same rigor as the driver gate: identical SQL,
order-insensitive frame compare.)"""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from deduplicate_ray.stages import lines


def _corpus():
    rng = np.random.Generator(np.random.PCG64(21))
    header = "// Copyright (c) Example Corp."
    banner = "# AUTO-GENERATED -- DO NOT EDIT"
    rows = []
    for d in range(50):
        body = [f"line {d}-{i} {rng.integers(0, 9)}"
                for i in range(int(rng.integers(1, 6)))]
        doc_lines = []
        if d % 2 == 0:
            doc_lines.append(header)
        if d % 3 == 0:
            doc_lines.append("   " + banner + "  ")   # trims to the banner
        doc_lines += body
        if d % 5 == 0:
            doc_lines.append("")                       # blank line kept
            doc_lines.append(body[0])                  # in-doc repeat
        rows.append({"doc_id": d, "text": "\n".join(doc_lines)})
    return pd.DataFrame(rows)


COUNT_SQL = """
    SELECT line, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
      SELECT DISTINCT doc_id, line FROM (
        SELECT doc_id,
               trim(unnest(string_split(text, chr(10)))) AS line
        FROM documents))
    WHERE line <> ''
    GROUP BY line HAVING COUNT(*) >= {k}
    ORDER BY line
"""

STRIP_SQL = """
    WITH ls AS (
      SELECT doc_id, i, line, trim(line) AS tline FROM (
        SELECT doc_id, unnest(ls) AS line,
               unnest(range(1, len(ls) + 1)) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM documents))),
    hot AS (
      SELECT line FROM (
        SELECT line, COUNT(*) AS n FROM (
          SELECT DISTINCT doc_id, tline AS line FROM ls WHERE tline <> '')
        GROUP BY line) WHERE n >= {k})
    SELECT d.doc_id,
           COALESCE(agg.text, '') AS text
    FROM documents d LEFT JOIN (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
      FROM ls
      WHERE tline = '' OR tline NOT IN (SELECT line FROM hot)
      GROUP BY doc_id) agg USING (doc_id)
    ORDER BY doc_id
"""


def test_line_counts_matches_duckdb():
    df = _corpus()
    got = lines.line_counts(rd.from_pandas(df).repartition(4), min_docs=2) \
        .to_pandas().sort_values("line").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(COUNT_SQL.format(k=2)).df()
    assert len(want) >= 2   # header + banner at least
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # in-doc repeats count once: no `line d-...` body line reaches k=2
    assert not any(w.startswith("line ") for w in want.line)


def test_strip_hot_lines_matches_duckdb():
    df = _corpus()
    got = lines.strip_hot_lines(rd.from_pandas(df).repartition(4),
                                min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(STRIP_SQL.format(k=2)).df()
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], want,
                                  check_dtype=False)
    # the hot header is gone, bodies and blank lines survive
    assert all("Copyright" not in t for t in got.text)
    assert any("\n\n" in t or t.endswith("\n") or "\n" in t
               for t in got.text)


def test_strip_noop_when_no_hot_lines():
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["unique one\nalpha", "unique two\nbeta"]})
    got = lines.strip_hot_lines(rd.from_pandas(df), min_docs=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], df,
                                  check_dtype=False)


def test_paragraph_granularity_census_and_strip():
    """delimiter="\\n\\n" = paragraph-level dedup (CCNet/RefinedWeb-style):
    census counts distinct docs per trimmed paragraph; strip removes hot
    paragraphs whole, re-joining survivors with the blank-line separator."""
    boiler = "Subscribe to our newsletter!\nFollow us."
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [f"intro zero\n\n{boiler}\n\nbody zero",
                 f"{boiler}\n\nbody one",
                 "body two only"]})
    ds = rd.from_pandas(df)
    census = lines.line_counts(ds, min_docs=2, delimiter="\n\n") \
        .to_pandas()
    assert census.line.tolist() == [boiler]
    assert census.n_docs.tolist() == [2]
    got = lines.strip_hot_lines(ds, min_docs=2, delimiter="\n\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.text.tolist() == ["intro zero\n\nbody zero",
                                 "body one", "body two only"]
    # line-level default is unchanged by the parameterization: the
    # boilerplate lines cross paragraph boundaries there
    line_census = lines.line_counts(ds, min_docs=2).to_pandas()
    assert set(line_census.line) == {"Subscribe to our newsletter!",
                                     "Follow us."}
