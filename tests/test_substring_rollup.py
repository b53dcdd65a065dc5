"""Stage-3 containment + roll-up / keeper-election tests (reference phase-2
capability parity; scenarios mirror test_deduplicate.py supersets/nesting)."""

import pyarrow as pa
import ray.data as rd

from deduplicate_ray import PipelineConfig
from deduplicate_ray.fixtures import fx_embedded, file_id
from deduplicate_ray.stages import exact, rollup, substring


def test_containment_pairs_in_group_unit():
    ids = ["inner", "outer", "other", "tiny"]
    contents = [
        "A" * 40 + "B" * 24,
        "X" * 10 + "A" * 40 + "B" * 24 + "Y" * 5,
        "Z" * 100,
        "A",  # below min_len
    ]
    pairs = substring.containment_pairs_in_group(ids, contents, min_len=32)
    assert pairs == [("inner", "outer")]


def test_containment_equal_contents_not_reported():
    pairs = substring.containment_pairs_in_group(
        ["a", "b"], ["Q" * 64, "Q" * 64], min_len=32)
    assert pairs == []


def test_suffix_array_matches_brute_force(monkeypatch):
    """The SA-backed scan must produce exactly the brute-find edge set
    (same inputs, forced down both paths)."""
    import numpy as np
    rng = np.random.default_rng(7)
    alphabet = "abcdef"
    docs = ["".join(rng.choice(list(alphabet), size=200)) for _ in range(30)]
    # embed some docs inside others
    docs[3] = docs[0] + docs[1] + "xyz"
    docs[7] = "qq" + docs[2] + "zz"
    docs[9] = docs[2]  # equal content: must NOT be reported
    ids = [f"d{i}" for i in range(len(docs))]

    brute = substring.containment_pairs_in_group(ids, docs, min_len=32)
    monkeypatch.setattr(substring, "_SA_MIN_BYTES", 0)
    via_sa = substring.containment_pairs_in_group(ids, docs, min_len=32)
    assert via_sa == brute
    assert ("d0", "d3") in via_sa and ("d2", "d7") in via_sa
    assert ("d2", "d9") not in via_sa and ("d9", "d7") in via_sa


def test_suffix_array_unit():
    from deduplicate_ray.stages.substring import (_sa_occurrences,
                                                  build_suffix_array)
    s = b"banana"
    sa = build_suffix_array(s)
    # suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    assert sorted(_sa_occurrences(s, sa, b"ana").tolist()) == [1, 3]
    assert sorted(_sa_occurrences(s, sa, b"na").tolist()) == [2, 4]
    assert _sa_occurrences(s, sa, b"xyz").tolist() == []


def test_embedded_fixture_edges():
    fx = fx_embedded(n_pairs=6)
    cfg = PipelineConfig()
    ds = substring.add_ids_only(rd.from_arrow(fx.table()))
    edges = substring.containment_edges(ds, cfg)
    got = {(r["src"], r["dst"]) for r in edges.take_all()}
    for inner, outer in fx.containments:
        assert (inner, outer) in got, f"missing containment {inner} in {outer}"


def test_sharded_group_scan_matches_unsharded():
    """A group over the byte cap is scanned in k^2 bounded shard-pair
    tasks; the edge set must be identical to the single-task scan."""
    fx = fx_embedded(n_pairs=6)
    ds = substring.add_ids_only(rd.from_arrow(fx.table()))
    base = substring.containment_edges(ds, PipelineConfig())
    expect = {(r["src"], r["dst"]) for r in base.take_all()}
    assert expect, "fixture should contain containment pairs"
    # force sharding: cap far below the fixture's group bytes
    cfg = PipelineConfig(substring_group_bytes_cap=2048)
    sharded = substring.containment_edges(ds, cfg)
    got = {(r["src"], r["dst"]) for r in sharded.take_all()}
    assert got == expect


def _monorepo_fixture(cap: int):
    """One repo ~10x over the byte cap, code-like length skew (most bytes
    in the longer docs), with embedded short→long containment pairs."""
    import numpy as np
    from numpy.random import Generator, PCG64
    from deduplicate_ray.fixtures import Fixture, _rand_code

    rng = Generator(PCG64(7))
    fx = Fixture("monorepo")
    inners = []
    for i in range(40):  # short docs, some embedded below
        inners.append(_rand_code(rng, int(rng.integers(4, 12))))
        fx.add("org9/mono", f"small/s{i}.py", inners[-1], rng=rng)
    total = 0
    i = 0
    while total < 10 * cap:  # lognormal lengths: big files carry the bytes
        n_lines = int(np.clip(np.exp(rng.normal(4.6, 1.0)), 8, 4000))
        body = _rand_code(rng, n_lines)
        if i % 3 == 0:  # embed a short doc verbatim
            k = int(rng.integers(0, len(inners)))
            body = body + inners[k] + _rand_code(rng, 5)
        fx.add("org9/mono", f"big/b{i}.py", body, rng=rng)
        total += len(body.encode())
        i += 1
    return fx


def test_length_aware_sharding_volume_and_parity():
    """Round-3 verdict #2 'done' criterion: a single-repo group at 10x the
    byte cap must (a) produce the identical edge set to the unsharded
    scan, and (b) ship O(bytes), not O(bytes^2/cap) — the old every-
    shard-pair scheme exploded each doc 2k times (~20x here); the
    length-aware scheme's host side is exactly 1x and queries visit only
    shards that can hold strictly longer docs."""
    import pyarrow.compute as pc

    cap = 16384
    fx = _monorepo_fixture(cap)
    tbl = fx.table()
    in_bytes = pc.sum(pc.binary_length(tbl.column("content"))).as_py()
    assert in_bytes > 8 * cap

    ds = substring.add_ids_only(rd.from_arrow(tbl))
    base = substring.containment_edges(ds, PipelineConfig())
    expect = {(r["src"], r["dst"]) for r in base.take_all()}
    assert expect, "fixture should contain containment pairs"

    cfg = PipelineConfig(substring_group_bytes_cap=cap)
    sharded = substring.containment_edges(ds, cfg)
    got = {(r["src"], r["dst"]) for r in sharded.take_all()}
    assert got == expect

    exploded = substring.containment_edges(ds, cfg, _return_exploded=True)
    shipped = 0
    for b in exploded.iter_batches(batch_format="pyarrow"):
        shipped += pc.sum(pc.binary_length(b.column("content"))).as_py() or 0
    ratio = shipped / in_bytes
    k = -(-in_bytes // cap)
    # skewed (code-like) corpus: near-linear shipped volume; and in ANY
    # shape the scheme must beat the old every-shard-pair 2k explosion
    assert ratio <= 4.0, f"exploded volume {ratio:.1f}x input (O(bytes^2)?)"
    assert ratio < k, f"{ratio:.1f}x >= k={k} (no better than pairwise)"


def test_window_hash_kernel():
    """Rolling window hash == direct polynomial evaluation; anchor keys
    are a pure function of the window bytes (embedding-invariant)."""
    import numpy as np
    from deduplicate_ray.stages.substring import (_window_hashes, _B64,
                                                  _batch_anchors)

    rng = np.random.default_rng(3)
    buf = rng.integers(0, 256, 200, dtype=np.uint8)
    w = 7
    got = _window_hashes(buf, w)
    for i in [0, 1, 57, 193]:
        direct = np.uint64(0)
        for j in range(w):
            direct = direct * _B64 + np.uint64(buf[i + j])
        assert got[i] == direct
    # embedding invariance: the anchors of `inner` appear among the
    # anchors of any host that contains it verbatim
    inner = "\n".join(f"def f{i}(x):\n    return x * {i}" for i in range(20))
    host = "PREFIX----" + inner + "-----SUFFIX" * 4
    d_i, k_i = _batch_anchors([inner], 32, 16)
    d_h, k_h = _batch_anchors([host], 32, 16)
    assert k_i.size > 0, "inner should have anchors at gap=16"
    assert set(k_i.tolist()) <= set(k_h.tolist())


def test_anchor_column_path_matches_list_path():
    """The zero-copy Arrow-column anchor kernels (_batch_anchors_col /
    _first_anchor_col, buffer-sliced off the string column, optional row
    subset) == the list-of-str wrappers, including nulls (read as empty),
    unicode, a sliced column (non-zero array offset), chunked input, and
    large_string layout."""
    import numpy as np
    import pyarrow as pa
    from deduplicate_ray.stages.substring import (
        _batch_anchors, _batch_anchors_col, _first_anchor,
        _first_anchor_col)

    docs = ["x" * 100,
            "\n".join(f"def f{i}(x):\n    return x * {i}" for i in range(20)),
            None, "", "naïve café über " * 20, "short",
            "PREFIX" + "body " * 50 + "SUFFIX"]
    w, gap = 32, 16
    as_list = [(d or "") for d in docs]

    for typ in (pa.string(), pa.large_string()):
        col = pa.chunked_array([pa.array(docs[:3], typ),
                                pa.array(docs[3:], typ)])
        d0, k0 = _batch_anchors(as_list, w, gap)
        d1, k1 = _batch_anchors_col(col, None, w, gap)
        assert np.array_equal(d0, d1) and np.array_equal(k0, k1), typ
        h0, f0 = _first_anchor(as_list, w, gap)
        h1, f1 = _first_anchor_col(col, None, w, gap)
        assert np.array_equal(h0, h1) and np.array_equal(f0[h0], f1[h1])

        rows = np.array([1, 4, 6], np.int64)
        ds, ks = _batch_anchors_col(col, rows, w, gap)
        de, ke = _batch_anchors([as_list[i] for i in rows], w, gap)
        assert np.array_equal(ds, de) and np.array_equal(ks, ke), typ

    # non-zero offset: a sliced flat array shares the parent's buffers
    flat = pa.array(docs, pa.string()).slice(1, 5)
    d2, k2 = _batch_anchors_col(flat, None, w, gap)
    de2, ke2 = _batch_anchors(as_list[1:6], w, gap)
    assert np.array_equal(d2, de2) and np.array_equal(k2, ke2)


def test_routing_fallbacks_match_unsharded():
    """Exactness of both degraded modes: visits budget blown (-> full
    length-pruned fanout) and anchor group cap blown (-> per-query
    overflow sentinel -> fanout)."""
    cap = 16384
    fx = _monorepo_fixture(cap)
    ds = substring.add_ids_only(rd.from_arrow(fx.table()))
    expect = {(r["src"], r["dst"])
              for r in substring.containment_edges(
                  ds, PipelineConfig()).take_all()}
    for kw in ({"substring_visits_budget": 0},
               {"substring_anchor_group_cap": 0}):
        cfg = PipelineConfig(substring_group_bytes_cap=cap, **kw)
        got = {(r["src"], r["dst"])
               for r in substring.containment_edges(ds, cfg).take_all()}
        assert got == expect, f"fallback {kw} diverged"


def test_keeper_report_matches_golden():
    """Regression pin for the greedy keeper policy (not SQL-expressible,
    so the driver records rows-only): the seeded sf0.01 corpus is
    deterministic — the full 50-row delete report is pinned as a golden
    parquet (round-2 verdict #7). Regenerate deliberately with the
    snippet in the golden file's git log if the policy changes."""
    import os
    import pyarrow.parquet as pq
    from deduplicate_ray.pipelines.queries import QUERIES
    golden_path = os.path.join(os.path.dirname(__file__),
                               "golden_keeper_report_sf001.parquet")
    golden = pq.read_table(golden_path)
    got = QUERIES["keeper_report_docs"]("/root/testdata/sf0.01")
    got = got.sort_by([("to_delete", "ascending")])
    assert got.num_rows == golden.num_rows
    assert got.column_names == golden.column_names
    assert got.equals(golden.cast(got.schema))


def _members(table):
    hashes = exact.hash_corpus(rd.from_arrow(table))
    return exact.exact_members(hashes)


def _tbl(rows):
    return pa.table({
        "repo": [r[0] for r in rows], "path": [r[1] for r in rows],
        "commit": ["c"] * len(rows), "lang": ["t"] * len(rows),
        "content": [r[2] for r in rows]})


def test_dir_rollup_ancestor_counts():
    t = _tbl([
        ("r", "a/f1.txt", "dup" * 100),
        ("r", "a/b/f2.txt", "dup" * 100),
        ("r", "a/b/f3.txt", "unique" * 50),
    ])
    hashes = exact.hash_corpus(rd.from_arrow(t))
    members = exact.exact_members(hashes)
    roll = {r["dir"]: r for r in
            rollup.dir_rollup(members, hashes).take_all()}
    assert roll["r"]["total_count"] == 3
    assert roll["r"]["dupe_count"] == 2
    assert roll["r/a"]["total_count"] == 3
    assert roll["r/a/b"]["total_count"] == 2
    assert roll["r/a/b"]["dupe_count"] == 1
    assert roll["r/a/b"]["uniq_count"] == 1


def test_keeper_election_superset_dir_wins():
    """Mirrors test_deduplicate.py superset scenarios: the dir holding more
    duplicates is elected keeper; copies elsewhere are deleted."""
    t = _tbl([
        ("r", "full/x.txt", "X" * 500),
        ("r", "full/y.txt", "Y" * 500),
        ("r", "partial/x.txt", "X" * 500),
        ("r", "other/y.txt", "Y" * 500),
    ])
    keepers = rollup.elect_keepers(_members(t))
    rows = {r["file_id"]: r for r in keepers.take_all()}
    fx_full_x = file_id("r", "c", "full/x.txt")
    fx_full_y = file_id("r", "c", "full/y.txt")
    fx_part_x = file_id("r", "c", "partial/x.txt")
    fx_other_y = file_id("r", "c", "other/y.txt")
    assert rows[fx_full_x]["is_kept"] and rows[fx_full_y]["is_kept"]
    assert not rows[fx_part_x]["is_kept"]
    assert not rows[fx_other_y]["is_kept"]
    assert rows[fx_part_x]["keeper"] == fx_full_x
    assert rows[fx_part_x]["keeper_dir"] == "r/full"


def test_dupe_report_and_freed_bytes():
    t = _tbl([
        ("r", "a/x.txt", "X" * 100),
        ("r", "b/x.txt", "X" * 100),
    ])
    keepers = rollup.elect_keepers(_members(t))
    report = rollup.dupe_report(keepers)
    rows = report.take_all()
    assert len(rows) == 1
    assert rows[0]["size"] == 100
    assert rollup.freed_bytes(report) == 100
    assert list(rows[0].keys()) == ["to_delete", "keeper", "keeper_dir", "size"]


def test_keeper_deterministic():
    t = _tbl([
        ("r", "a/x.txt", "X" * 100),
        ("r", "b/x.txt", "X" * 100),
    ])
    k1 = rollup.elect_keepers(_members(t)).take_all()
    k2 = rollup.elect_keepers(_members(t)).take_all()
    assert k1 == k2
    # tie between dirs a and b -> lexicographically smallest dir kept
    kept = [r for r in k1 if r["is_kept"]]
    assert kept[0]["dir"] == "r/a"


def test_dir_rollup_matches_bruteforce_on_random_paths():
    """Property check of the two-level rollup (vectorized dirname reduce +
    dir-relation ancestor explode) against a per-file ancestor_prefixes
    brute force: multiple repos, root-level files, deep paths, and files
    whose names contain regex metacharacters."""
    import collections
    import random

    rng = random.Random(7)
    segs = ["a", "b", "c.d", "e-f", "g h", "x+y"]
    rows = []
    for i in range(200):
        repo = f"repo{rng.randrange(3)}"
        depth = rng.randrange(0, 5)
        d = "/".join(rng.choice(segs) for _ in range(depth))
        name = f"f{i % 37}.txt"            # reuse names -> cross-dir dups
        path = f"{d}/{name}" if d else name
        content = f"payload-{i % 23}" * 10  # 23 content families -> dups
        rows.append((repo, path, content))
    t = _tbl(rows)

    hashes = exact.hash_corpus(rd.from_arrow(t))
    members = exact.exact_members(hashes)
    got = {r["dir"]: r for r in rollup.dir_rollup(members, hashes).take_all()}

    dup_ids = {r["file_id"] for r in members.take_all()}
    exp = collections.defaultdict(lambda: [0, 0, 0])  # total, dupe, bytes
    for r in hashes.take_all():
        for pref in rollup.ancestor_prefixes(r["repo"], r["path"]):
            exp[pref][0] += 1
            exp[pref][1] += int(r["file_id"] in dup_ids)
            exp[pref][2] += r["size"]

    assert set(got) == set(exp)
    for d, (total, dupe, size) in exp.items():
        assert got[d]["total_count"] == total, d
        assert got[d]["dupe_count"] == dupe, d
        assert got[d]["bytes"] == size, d
        assert got[d]["uniq_count"] == total - dupe, d
