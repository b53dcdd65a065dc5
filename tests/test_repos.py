"""Repo-level fork detection: exact pair Jaccard vs DuckDB, the
boilerplate cap, and the MinHash sketch path's recall."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deduplicate_ray.stages import repos


def _fork_corpus(n_files=100, shared=80, boiler=3):
    """repoA/repoB are forks sharing ``shared`` of ``n_files`` files;
    repoC is unrelated; ``boiler`` boilerplate files appear in ALL
    repos (exercises the ubiquitous-fp cap when it is set below 3)."""
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    files = [f"file body {i} " + "x" * 60 for i in range(n_files)]
    other = [f"unrelated {i} " + "y" * 60 for i in range(n_files)]
    boilerplate = [f"license header {i} " + "z" * 60 for i in range(boiler)]

    def add(repo, i, content):
        rows["repo"].append(repo)
        rows["path"].append(f"{repo}/{i}")
        rows["commit"].append("")
        rows["lang"].append("")
        rows["content"].append(content)

    for i, f in enumerate(files + boilerplate):
        add("repoA", i, f)
    for i, f in enumerate(files[:shared] + other[:n_files - shared]
                          + boilerplate):
        add("repoB", i, f)
    for i, f in enumerate(other[n_files - shared:] + boilerplate):
        add("repoC", i, f)
    return pa.table(rows)


def _oracle(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("corpus", df)
    return con.execute(f"""
        WITH fh AS (SELECT DISTINCT repo, md5(substr(content, 1, 40)) AS fp
                    FROM corpus),
        eligible AS (SELECT fp FROM fh
                     GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND {cap}),
        sizes AS (SELECT repo, COUNT(*) AS n FROM fh GROUP BY repo),
        pairs AS (
          SELECT a.repo AS repo_a, b.repo AS repo_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_files
          FROM fh a JOIN fh b USING (fp) JOIN eligible e USING (fp)
          WHERE a.repo < b.repo GROUP BY 1, 2)
        SELECT p.repo_a, p.repo_b, p.shared_files,
               ROUND(p.shared_files / (sa.n + sb.n - p.shared_files), 6)
                 AS jaccard
        FROM pairs p JOIN sizes sa ON sa.repo = p.repo_a
        JOIN sizes sb ON sb.repo = p.repo_b
        ORDER BY repo_a, repo_b
    """).df()


def test_repo_pair_jaccard_matches_duckdb():
    t = _fork_corpus()
    got = repos.repo_pair_jaccard(rd.from_arrow(t).repartition(4),
                                  n_parts=4).to_pandas() \
        .sort_values(["repo_a", "repo_b"]).reset_index(drop=True)
    want = _oracle(t.to_pandas(), cap=64)
    assert len(want) == 3  # A-B (fork), plus boilerplate-only A-C / B-C
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_boilerplate_cap_drops_ubiquitous_fps():
    t = _fork_corpus(boiler=3)
    got = repos.repo_pair_jaccard(rd.from_arrow(t).repartition(4),
                                  max_repos_per_fp=2, n_parts=4) \
        .to_pandas().sort_values(["repo_a", "repo_b"]).reset_index(drop=True)
    want = _oracle(t.to_pandas(), cap=2)
    # boilerplate (in all 3 repos) no longer links A-C / B-C
    assert set(zip(want.repo_a, want.repo_b)) == {("repoA", "repoB")}
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucketed_size_join_matches_broadcast():
    t = _fork_corpus()
    ds = rd.from_arrow(t).repartition(4)
    a = repos.repo_pair_jaccard(ds, n_parts=4).to_pandas() \
        .sort_values(["repo_a", "repo_b"]).reset_index(drop=True)
    b = repos.repo_pair_jaccard(ds, n_parts=4, size_broadcast_limit=0) \
        .to_pandas().sort_values(["repo_a", "repo_b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_repo_minhash_recall_on_forks():
    t = _fork_corpus()
    ds = rd.from_arrow(t).repartition(4)
    exact = repos.repo_pair_jaccard(ds, n_parts=4).to_pandas()
    mh = repos.repo_minhash_pairs(ds, threshold=0.3).to_pandas()
    got = set(zip(mh.repo_a, mh.repo_b))
    # the true fork pair (J≈0.63) must be found; estimate within ±0.15
    assert ("repoA", "repoB") in got
    est = float(mh[(mh.repo_a == "repoA")
                   & (mh.repo_b == "repoB")].est_jaccard.iloc[0])
    true = float(exact[(exact.repo_a == "repoA")
                       & (exact.repo_b == "repoB")].jaccard.iloc[0])
    assert abs(est - true) < 0.15
    # low-similarity pairs (boilerplate-only overlap) stay below threshold
    assert ("repoA", "repoC") not in got
