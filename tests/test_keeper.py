"""Survivor-set golden tests for the reference-parity keeper election.

Each scenario is ported from the reference's end-to-end CLI tests
(``/root/reference/test_deduplicate.py:198-533``): file content = the
basename fragment before '_' (``generate_input``, ``:70-88``), the oracle is
the surviving (directory, content) set — tolerant of WHICH copy survived,
exactly like the reference's ``validate_output`` (``:111-196``).
"""

import posixpath

import pyarrow as pa
import ray.data as rd

from deduplicate_ray.stages import exact, keeper, rollup


def _corpus(paths: list[str]) -> pa.Table:
    """Reference tree DSL → corpus rows: first component = repo (the
    analyzed root), content = basename fragment before '_'."""
    repos, rels, contents = [], [], []
    for p in paths:
        if p.endswith("/"):        # empty dir — no table analog, skip
            continue
        first, _, rest = p.partition("/")
        repos.append(first)
        rels.append(rest)
        contents.append(posixpath.basename(p).split("_")[0])
    n = len(repos)
    return pa.table({"repo": repos, "path": rels,
                     "commit": ["c"] * n, "lang": ["t"] * n,
                     "content": contents})


def _survivors(paths: list[str]) -> set[tuple[str, str]]:
    """Run hashing + exact grouping + election; return the surviving
    (dir, content) set (uniques always survive)."""
    t = _corpus(paths)
    ds = rd.from_arrow(t)
    hashes = exact.hash_corpus(ds).materialize()
    members = exact.exact_members(hashes)
    files, dwd, final_output, delete_lookup, _c = keeper.elect(
        members, hashes)
    deleted = {f.file_id for f in files.values() if f.is_deleted}
    out = set()
    for repo, rel, content in zip(t.column("repo").to_pylist(),
                                  t.column("path").to_pylist(),
                                  t.column("content").to_pylist()):
        fid = f"{repo}:c:{rel}"
        if fid not in deleted:
            full = repo + "/" + rel
            out.add((posixpath.dirname(full), content))
    return out


def _expected(paths: list[str]) -> set[tuple[str, str]]:
    out = set()
    for p in paths:
        if p.endswith("/"):
            continue
        out.add((posixpath.dirname(p), posixpath.basename(p).split("_")[0]))
    return out


def check(input_paths, output_paths):
    assert _survivors(input_paths) == _expected(output_paths)


def test_simple():
    # test_deduplicate.py:198 — two copies in one folder collapse to one
    check(["folder1/file1_a", "folder1/file1_b", "folder2/file2"],
          ["folder1/file1", "folder2/file2"])


def test_sep_directories():
    # :226 — whole-dir duplicate across roots
    check(["folder1/file1", "folder1/file2",
           "folder2/file1", "folder2/file2"],
          ["folder1/file1", "folder1/file2"])


def test_superset():
    # :241 — the dir with the extra unique file is kept
    check(["folder1/file1", "folder1/file2", "folder1/file3",
           "folder2/file1", "folder2/file2"],
          ["folder1/file1", "folder1/file2", "folder1/file3"])


def test_superset2():
    # :258 — symmetric: folder2 is the superset this time
    check(["folder1/file1", "folder1/file2",
           "folder2/file1", "folder2/file2", "folder2/file3"],
          ["folder2/file1", "folder2/file2", "folder2/file3"])


def test_nested():
    # :275 — parent wins over its own duplicate child
    check(["folder1/file1", "folder1/file2",
           "folder1/child1/file1", "folder1/child1/file2",
           "folder2/file1", "folder2/file2"],
          ["folder1/file1", "folder1/file2"])


def test_nested2():
    # :292
    check(["folder1/file1", "folder1/file2",
           "folder1/child1/file1", "folder1/child1/file2",
           "folder1/child2/file1", "folder1/child2/file2",
           "folder2/file1", "folder2/file2",
           "folder2/child1/file1", "folder2/child2/file2"],
          ["folder1/file1", "folder1/file2"])


def test_nested3():
    # :313 — check_largest switches to the child holding an extra file
    check(["folder1/file1", "folder1/file2",
           "folder1/child1/file1", "folder1/child1/file2",
           "folder1/child2/file1", "folder1/child2/file2",
           "folder1/child2/file3",
           "folder2/file1", "folder2/file2",
           "folder2/child1/file1", "folder2/child2/file2"],
          ["folder1/child2/file1", "folder1/child2/file2",
           "folder1/child2/file3"])


def test_nested_deep():
    # :336 — four levels of nesting collapse to the top copy
    check(["folder1/file1", "folder1/file2",
           "folder1/child1/file1", "folder1/child1/file2",
           "folder1/child2/file1", "folder1/child2/file2",
           "folder1/child2/grand1/file1", "folder1/child2/grand1/file2",
           "folder1/child2/grand1/greatgrand1/file1",
           "folder1/child2/grand1/greatgrand1/file2",
           "folder2/file1", "folder2/file2",
           "folder2/child1/file1", "folder2/child2/file2",
           "folder2/child2/grand1/greatgrand1/file2"],
          ["folder1/file1", "folder1/file2"])


def test_nested_deep4():
    # :409 — scattered single copies coalesce into the multi-dir family
    check(["folder1/file1",
           "folder2/child1/grand1/file1",
           "folder2/child2/grand2/file2",
           "folder2/child3/grand2/file3"],
          ["folder2/child1/grand1/file1",
           "folder2/child2/grand2/file2",
           "folder2/child3/grand2/file3"])


def test_separate_dupes():
    # :461 — two disjoint dupe families, multi-pass election
    check(["folder1/child1/file1", "folder1/child1/file2",
           "folder1/child1/file3",
           "folder1/child2/file4", "folder1/child2/file5",
           "folder1/child2/file6",
           "folder2/child2/grand1/file1", "folder2/child2/grand2/file2",
           "folder2/child2/grand3/file3", "folder2/child2/grand4/file4",
           "folder2/child2/grand5/file5", "folder2/file6"],
          ["folder1/child1/file1", "folder1/child1/file2",
           "folder1/child1/file3",
           "folder1/child2/file4", "folder1/child2/file5",
           "folder1/child2/file6"])


def test_separate_dupes2():
    # :488 — plus a unique straggler that must survive in place
    check(["folder1/child1/file1", "folder1/child1/file2",
           "folder1/child1/file3",
           "folder1/child2/file4", "folder1/child2/file5",
           "folder1/child2/file6",
           "folder2/child1/grand1/file1", "folder2/child1/grand2/file2",
           "folder2/child1/grand3/file3", "folder2/child1/grand4/file4",
           "folder2/child2/grand5/file5",
           "folder2/file6", "folder2/file7"],
          ["folder1/child1/file1", "folder1/child1/file2",
           "folder1/child1/file3",
           "folder1/child2/file4", "folder1/child2/file5",
           "folder1/child2/file6", "folder2/file7"])


def test_incomplete_dir():
    # :517 — the deeper dir holding strictly more content is kept
    check(["folder1/child1/file1", "folder1/child1/file2",
           "folder2/child1/grand1/file1", "folder2/child1/grand1/file2",
           "folder2/child1/grand1/file3", "folder2/file1"],
          ["folder2/child1/grand1/file1", "folder2/child1/grand1/file2",
           "folder2/child1/grand1/file3"])


def test_dir_collapse_cleanup():
    # deduplicate.py:640-676 — when every file of a dir is deleted and it
    # holds nothing else, the report recommends ONE dir delete
    t = _corpus(["folder1/file1", "folder1/file2",
                 "folder2/sub/file1", "folder2/sub/file2"])
    ds = rd.from_arrow(t)
    hashes = exact.hash_corpus(ds).materialize()
    members = exact.exact_members(hashes)
    rep = rollup.full_report(members, hashes).take_all()
    dir_rows = [r for r in rep if r["is_dir"]]
    # collapse cascades all the way up: sub is empty -> replaced by sub;
    # folder2 then holds nothing but the deleted sub -> replaced by folder2
    # (the reference deletes emptied roots too: test_sep_directories'
    # expected output has no folder2 at all)
    assert len(dir_rows) == 1
    assert dir_rows[0]["to_delete"] == "folder2"
    file_rows = [r for r in rep if not r["is_dir"]]
    assert all(not r["to_delete"].startswith("folder2")
               for r in file_rows)


def test_scalable_election_survivor_set_and_density_policy():
    """Cluster-scale election (no driver graph): exactly one keeper per
    exact-dup group survives, deletes always point at a same-group keeper,
    and the dup-density policy keeps the copies in the directory that
    concentrates the duplicates (folder1 holds a copy of everything)."""
    paths = ["folder1/a_1", "folder1/b_1", "folder1/c_1",
             "folder2/a_2", "folder3/b_2", "folder3/c_2",
             "folder4/unique_only"]
    t = _corpus(paths)
    ds = rd.from_arrow(t)
    hashes = exact.hash_corpus(ds).materialize()
    members = exact.exact_members(hashes)
    rows = keeper.elect_keepers_scalable(members).take_all()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["exact_group_id"], []).append(r)
    assert len(by_group) == 3          # a, b, c families
    for g, rs in by_group.items():
        keepers = [r for r in rs if r["is_kept"]]
        assert len(keepers) == 1
        kid = keepers[0]["file_id"]
        for r in rs:
            assert r["keeper"] == kid  # every delete points at the keeper
            assert r["keeper_dir"] == keepers[0]["dir"]
    # density policy: folder1 (3 dup members) outranks folder2/folder3
    for rs in by_group.values():
        k = [r for r in rs if r["is_kept"]][0]
        assert k["dir"] == "folder1"


def test_scalable_election_deterministic():
    paths = ["r/x/a_1", "r/y/a_2", "r/x/b_1", "r/y/b_2"]
    ds = rd.from_arrow(_corpus(paths))
    hashes = exact.hash_corpus(ds).materialize()
    members = exact.exact_members(hashes)
    r1 = sorted((r["file_id"], r["is_kept"]) for r in
                keeper.elect_keepers_scalable(members).take_all())
    r2 = sorted((r["file_id"], r["is_kept"]) for r in
                keeper.elect_keepers_scalable(members).take_all())
    assert r1 == r2
