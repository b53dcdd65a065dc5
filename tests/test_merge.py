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


def test_merge_reuses_cached_subset(tmp_path):
    """S7 cached-subset reuse (reference dupe_analysis.py:122-158): corpus
    A is analyzed once with a checkpoint dir; merging in corpus B reuses
    A's hashed checkpoint untouched (manifest byte-identical) and still
    finds the cross-corpus dupes."""
    import os
    from deduplicate_ray import PipelineConfig

    a = _corpus([("ra", "x.txt", "SHARED" * 100), ("ra", "u1.txt", "only-a" * 50)])
    b = _corpus([("rb", "y.txt", "SHARED" * 100)])
    cfg_a = PipelineConfig(checkpoint_dir=str(tmp_path / "a"),
                           input_fingerprint="corpus-a-v1")
    cfg_b = PipelineConfig(checkpoint_dir=str(tmp_path / "b"),
                           input_fingerprint="corpus-b-v1")

    # first analysis of A writes its checkpoint
    dedup.hashes_for(a, cfg_a).count()
    manifest = tmp_path / "a" / "hashes_full" / "_MANIFEST.json"
    before = manifest.read_bytes()
    mtime = os.stat(manifest).st_mtime_ns

    members = dedup.merge_analyses([(a, cfg_a), (b, cfg_b)])
    got = exact.groups_as_sets(members)
    assert got == [frozenset({file_id("ra", "c", "x.txt"),
                              file_id("rb", "c", "y.txt")})]
    # A's stage checkpoint was reused, not recomputed
    assert manifest.read_bytes() == before
    assert os.stat(manifest).st_mtime_ns == mtime


def test_checkpoint_input_fingerprint_invalidates(tmp_path):
    """Same config + same checkpoint dir + DIFFERENT input fingerprint must
    recompute (stale-cache guard; ADVICE round 1)."""
    from deduplicate_ray import PipelineConfig

    a1 = _corpus([("r", "x.txt", "V1" * 100)])
    a2 = _corpus([("r", "x.txt", "V2" * 100)])
    root = str(tmp_path / "ck")
    cfg1 = PipelineConfig(checkpoint_dir=root, input_fingerprint="in-v1")
    h1 = dedup.hashes_for(a1, cfg1).take_all()
    cfg2 = PipelineConfig(checkpoint_dir=root, input_fingerprint="in-v2")
    h2 = dedup.hashes_for(a2, cfg2).take_all()
    assert h1[0]["sha256"] != h2[0]["sha256"]  # recomputed, not stale


def test_human_size_parity():
    assert human_size(0) == "0.00 B"
    assert human_size(1023) == "1023.00 B"
    assert human_size(1024) == "1.00 KB"
    assert human_size(5 * 1024 * 1024) == "5.00 MB"
    assert human_size(3 * 1024 ** 4) == "3.00 TB"
