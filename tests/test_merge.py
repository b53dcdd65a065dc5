"""Analysis-merge semantics (mirrors the reference's DB-merge scenarios,
test_dupe_analysis.py:377-467 / FIXTURES.md merge_union): a file unique
within corpus A must become a dupe against corpus B after the merge."""

import pyarrow as pa
import ray.data as rd

from deduplicate_ray.fixtures import file_id
from deduplicate_ray.functions.paths import human_size
from deduplicate_ray.pipelines import dedup
from deduplicate_ray.stages import exact


def _corpus(rows):
    return rd.from_arrow(pa.table({
        "repo": [r[0] for r in rows], "path": [r[1] for r in rows],
        "commit": ["c"] * len(rows), "lang": ["t"] * len(rows),
        "content": [r[2] for r in rows]}))


def test_merge_finds_cross_corpus_dupes():
    a = _corpus([("ra", "x.txt", "SHARED" * 100), ("ra", "u1.txt", "only-a" * 50)])
    b = _corpus([("rb", "y.txt", "SHARED" * 100), ("rb", "u2.txt", "only-b" * 50)])
    # separately: no dupes at all
    for c in (a, b):
        assert exact.exact_members(exact.hash_corpus(c)).count() == 0
    merged = dedup.merge_corpora([a, b])
    groups = exact.groups_as_sets(exact.exact_members(exact.hash_corpus(merged)))
    assert groups == [frozenset({file_id("ra", "c", "x.txt"),
                                 file_id("rb", "c", "y.txt")})]


def test_merge_insert_or_ignore_identity():
    """Same (repo, commit, path) appearing in both inputs collapses to one
    row — the reference's UNIQUE-path INSERT OR IGNORE."""
    a = _corpus([("r", "same.txt", "AAA" * 50)])
    b = _corpus([("r", "same.txt", "AAA" * 50), ("r", "other.txt", "BBB" * 50)])
    merged = dedup.merge_corpora([a, b])
    assert merged.count() == 2
    # and the collapsed row is unique -> no duplicate groups
    assert exact.exact_members(exact.hash_corpus(merged)).count() == 0


def test_human_size_parity():
    assert human_size(0) == "0.00 B"
    assert human_size(1023) == "1023.00 B"
    assert human_size(1024) == "1.00 KB"
    assert human_size(5 * 1024 * 1024) == "5.00 MB"
    assert human_size(3 * 1024 ** 4) == "3.00 TB"
