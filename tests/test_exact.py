"""Stage-1 exact dedup golden-group tests — each fixture family mirrors a
reference scenario (see FIXTURES.md for the test_dupe_analysis.py mapping)."""

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from deduplicate_ray import PipelineConfig
from deduplicate_ray.config import SYNOLOGY_EXCLUDES
from deduplicate_ray.fixtures import (
    ALL_FAMILIES, file_id, fx_cascade_false_positive, fx_excludes, unit_corpus,
)
from deduplicate_ray.functions import hashing
from deduplicate_ray.stages import exact


def _ds(fx):
    return rd.from_arrow(fx.table())


def _expected(fx):
    return {g for g in fx.exact_groups if len(g) > 1}


@pytest.mark.parametrize("family", [
    "exact_simple", "size_prune", "empty_content", "cross_repo", "nested_dirs",
])
def test_exact_groups_family(family):
    fx = ALL_FAMILIES[family]()
    hashes = exact.hash_corpus(_ds(fx))
    got = set(exact.groups_as_sets(exact.exact_members(hashes)))
    assert got == _expected(fx)


def test_excludes_dropped_before_hashing():
    fx = fx_excludes()
    cfg = PipelineConfig(excludes=SYNOLOGY_EXCLUDES)
    hashes = exact.hash_corpus(_ds(fx), cfg)
    got = set(exact.groups_as_sets(exact.exact_members(hashes, cfg)))
    assert got == _expected(fx)
    # excluded rows are gone entirely
    paths = [r["path"] for r in hashes.select_columns(["path"]).take_all()]
    assert not any("@" in p or "/." in p for p in paths)


def test_cascade_false_positive_pins_offsets():
    """cascade(rev_hash) groups {f1a,f1b,f1c}; full-hash groups {f1a,f1b}.
    Pins the byte-exact sampled-window semantics (dupe_analysis.py:440-444)."""
    fx = fx_cascade_false_positive()
    ds = _ds(fx)

    sloppy = PipelineConfig(cascade=True, complete_hash=False)
    got_sloppy = set(exact.groups_as_sets(exact.cascade_members(ds, sloppy)))
    assert got_sloppy == {fx.near_clusters[0]}

    strict = PipelineConfig(cascade=True, complete_hash=True)
    got_strict = set(exact.groups_as_sets(exact.cascade_members(_ds(fx), strict)))
    assert got_strict == {fx.exact_groups[0]}


def test_unit_corpus_all_groups():
    fx = unit_corpus()
    cfg = PipelineConfig(excludes=SYNOLOGY_EXCLUDES)
    hashes = exact.hash_corpus(_ds(fx), cfg)
    got = set(exact.groups_as_sets(exact.exact_members(hashes, cfg)))
    assert got == _expected(fx)


def test_sha256_invariant_and_oracle():
    """Per-row invariant: engine sha256 == hashlib sha256 of the content."""
    fx = ALL_FAMILIES["exact_simple"]()
    hashed = exact.hash_corpus(_ds(fx), keep_content=True)
    for r in hashed.take_all():
        assert r["sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()
        assert r["size"] == len(r["content"].encode())
        assert r["file_id"] == file_id(r["repo"], r["commit"], r["path"])


def test_empty_content_constant_hash():
    """All-empty rows share the constant empty digest (M2 rule)."""
    from deduplicate_ray.config import EMPTY_SHA256
    t = pa.table({"repo": ["r"], "path": ["e.txt"], "commit": ["c"],
                  "lang": ["txt"], "content": [""]})
    out = exact.hash_corpus(rd.from_arrow(t), keep_content=True).take_all()
    assert out[0]["sha256"] == EMPTY_SHA256


def test_representatives_and_collapse():
    fx = ALL_FAMILIES["exact_simple"]()
    deduped = exact.exact_dedup(_ds(fx))
    rows = deduped.take_all()
    # 4 rows, one exact pair → 3 distinct contents survive
    assert len(rows) == 3
    assert len({r["sha256"] for r in rows}) == 3
    # the representative of the dup pair is the min file_id
    fx_ids = sorted(fx.exact_groups[0])
    assert fx_ids[0] in {r["file_id"] for r in rows}


def test_cascade_hash_parity_with_reference_offsets():
    """beg/rev hash equals a direct hashlib computation with the reference's
    seek/read arithmetic on a few odd sizes (incl. < chunk)."""
    cases = ["", "a", "x" * 100, "y" * 1024, "z" * 1025, "w" * 5000]
    t = pa.table({"repo": ["r"] * len(cases), "path": [f"p{i}" for i in range(len(cases))],
                  "commit": ["c"] * len(cases), "lang": ["t"] * len(cases),
                  "content": cases})
    out = hashing.add_cascade_hashes(t)
    for i, s in enumerate(cases):
        b = s.encode()
        n = len(b)
        chunk = 1024
        assert out.column("beg_hash")[i].as_py() == hashlib.sha1(b[:chunk]).hexdigest()
        h = hashlib.sha1()
        h.update(b[max(0, n - chunk): max(0, n - chunk) + chunk])
        mid = max(0, n // 2 - chunk // 2)
        h.update(b[mid: mid + chunk])
        assert out.column("rev_hash")[i].as_py() == h.hexdigest()
