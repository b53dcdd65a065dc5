"""JSONL corpus ingest: schema adaptation, deterministic synthetic ids,
and end-to-end exact dedup over a JSONL dump."""

import json
import os

import pytest

from deduplicate_ray.sources.corpus import read_jsonl_corpus, validate_schema
from deduplicate_ray.stages import exact


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [{"id": f"doc{i}", "text": f"document body {i % 7}",
             "lang": "en" if i % 2 else "de"} for i in range(40)]
    # two shards — read_json parallelizes at file granularity
    for shard in range(2):
        with open(d / f"part-{shard}.jsonl", "w") as f:
            for r in rows[shard * 20:(shard + 1) * 20]:
                f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_jsonl_corpus_schema_and_ids(jsonl_dir):
    files = sorted(os.path.join(jsonl_dir, f) for f in os.listdir(jsonl_dir))
    ds = validate_schema(read_jsonl_corpus(
        files, text_col="text", path_col="id", lang_col="lang"))
    rows = sorted(ds.take_all(), key=lambda r: r["path"])
    assert len(rows) == 40
    assert rows[0]["path"] == "doc0"
    assert rows[0]["content"] == "document body 0"
    assert {r["lang"] for r in rows} == {"en", "de"}


def test_read_jsonl_synthetic_path_is_deterministic(jsonl_dir):
    files = sorted(os.path.join(jsonl_dir, f) for f in os.listdir(jsonl_dir))
    a = sorted(r["path"] for r in read_jsonl_corpus(files).take_all())
    b = sorted(r["path"] for r in read_jsonl_corpus(files[::-1]).take_all())
    assert a == b, "synthetic ids must not depend on file order"
    # ids are content hashes: the 7 distinct bodies give 7 distinct ids
    assert len(set(a)) == 7


def test_jsonl_to_exact_dedup_end_to_end(jsonl_dir):
    files = sorted(os.path.join(jsonl_dir, f) for f in os.listdir(jsonl_dir))
    corpus = read_jsonl_corpus(files, text_col="text", path_col="id")
    groups = exact.colliding_keys(exact.hash_corpus(corpus)).take_all()
    # 40 docs over 7 distinct bodies: every body is a duplicate group
    assert len(groups) == 7
    assert sum(g["group_size"] for g in groups) == 40


def test_read_csv_corpus_roundtrip(tmp_path):
    import csv

    import ray.data as rd

    from deduplicate_ray.sources.corpus import read_csv_corpus
    from deduplicate_ray.sources.corpus import validate_schema

    p = tmp_path / "dump.csv"
    rows = [("r/a.py", "print(1)", "py"),
            ("r/b.py", "print(2)", "py"),
            ("r/c.md", "# title", "md")]
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "text", "lang"])
        w.writerows(rows)
    ds = validate_schema(read_csv_corpus(str(p), path_col="path",
                                         lang_col="lang"))
    got = sorted((r["path"], r["content"], r["lang"])
                 for r in ds.take_all())
    assert got == sorted(rows)
    # no path_col: synthetic ids are deterministic and distinct
    ds2 = read_csv_corpus(str(p))
    paths = [r["path"] for r in ds2.take_all()]
    assert len(set(paths)) == 3
    assert paths == [r["path"] for r in read_csv_corpus(str(p)).take_all()]
