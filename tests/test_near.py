"""Stage-2 MinHash/LSH/union-find tests: unit checks per operator plus the
dup-pair recall >= 0.99 gate vs a brute-force Jaccard oracle (north_rule)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deduplicate_ray import PipelineConfig
from deduplicate_ray.fixtures import fx_near_dup, fx_skew_boilerplate, file_id
from deduplicate_ray.pipelines import dedup
from deduplicate_ray.stages import exact, lsh, minhash
from deduplicate_ray.state import unionfind


# ---------------------------------------------------------------- minhash

def test_shingle_hashes_deterministic_and_short():
    a = minhash.shingle_hashes("hello world, hello", 5)
    b = minhash.shingle_hashes("hello world, hello", 5)
    assert np.array_equal(a, b)
    assert minhash.shingle_hashes("", 5).size == 1
    assert minhash.shingle_hashes("abc", 5).size == 1
    assert not np.array_equal(
        minhash.shingle_hashes("abc", 5), minhash.shingle_hashes("abd", 5))


def true_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = set(minhash.shingle_hashes(a, k).tolist())
    sb = set(minhash.shingle_hashes(b, k).tolist())
    return len(sa & sb) / max(1, len(sa | sb))


def test_minhash_estimates_jaccard_within_bounds():
    """Property: MinHash estimate within 4 sigma of true Jaccard
    (sigma = sqrt(J(1-J)/128) ~ 0.044)."""
    rng = np.random.Generator(np.random.PCG64(7))
    signer = minhash.MinHashSigner(PipelineConfig())
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2000))
    for edit_n in [0, 20, 100, 400]:
        other = list(base)
        for i in rng.choice(len(base), edit_n, replace=False):
            other[int(i)] = chr(97 + int(rng.integers(0, 26)))
        other = "".join(other)
        j = true_jaccard(base, other)
        sig = signer.signature_matrix([base, other])
        est = minhash.jaccard_estimate(sig[0], sig[1])
        assert abs(est - j) < 4 * np.sqrt(max(j * (1 - j), 0.01) / 128)


def test_sign_corpus_schema_and_identity():
    t = pa.table({"repo": ["r", "r"], "path": ["a", "b"], "commit": ["c", "c"],
                  "lang": ["t", "t"],
                  "content": ["same content here padded out", "same content here padded out"]})
    hashed = exact.hash_corpus(rd.from_arrow(t), keep_content=True)
    sigs = minhash.sign_corpus(hashed).take_all()
    assert len(sigs) == 2
    assert len(sigs[0]["sig"]) == 128
    assert list(sigs[0]["sig"]) == list(sigs[1]["sig"])  # identical content


def test_band_hashes_shape_and_collision():
    cfg = PipelineConfig()
    signer = minhash.MinHashSigner(cfg)
    sig = signer.signature_matrix(["aaaa bbbb cccc dddd", "aaaa bbbb cccc dddd",
                                   "totally different thing"])
    bh = minhash.band_hashes(sig, cfg.lsh_bands, cfg.lsh_rows)
    assert bh.shape == (3, 32)
    assert np.array_equal(bh[0], bh[1])
    assert not np.array_equal(bh[0], bh[2])


# ---------------------------------------------------------------- union-find

def test_driver_union_find_components():
    edges = [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z2"), ("y", "z")]
    m = unionfind.driver_union_find(edges)
    assert m["a"] == m["b"] == m["c"] == "a"
    assert m["x"] == m["y"] == m["z"] == m["z2"] == "x"


def test_connected_components_distributed_matches_driver():
    rng = np.random.Generator(np.random.PCG64(3))
    # random forest over 60 nodes in 6 chains
    edges = []
    for c in range(6):
        nodes = [f"n{c}_{i}" for i in range(10)]
        for a, b in zip(nodes, nodes[1:]):
            edges.append({"src": a, "dst": b})
    eds = rd.from_items(edges)
    drv = unionfind.connected_components(eds)
    dist = unionfind.connected_components(eds, driver_limit=0, num_partitions=4)
    to_map = lambda ds: {r["node"]: r["label"] for r in ds.take_all()}
    assert to_map(drv) == to_map(dist)


# ---------------------------------------------------------------- recall

def _oracle_pairs(fx, cfg):
    """Brute-force Jaccard >= threshold, transitively closed — the
    'reference clusters' oracle of BASELINE.md."""
    ids, texts = [], []
    for r in fx.rows:
        ids.append(file_id(r["repo"], r["commit"], r["path"]))
        texts.append(r["content"])
    shingles = [set(minhash.shingle_hashes(t, cfg.shingle_k).tolist()) for t in texts]
    edges = []
    for i, j in itertools.combinations(range(len(ids)), 2):
        inter = len(shingles[i] & shingles[j])
        if inter == 0:
            continue
        jac = inter / len(shingles[i] | shingles[j])
        if jac >= cfg.verify_threshold:
            edges.append((ids[i], ids[j]))
    m = unionfind.driver_union_find(edges)
    comps = {}
    for n, l in m.items():
        comps.setdefault(l, set()).add(n)
    pairs = set()
    for members in comps.values():
        for a, b in itertools.combinations(sorted(members), 2):
            pairs.add((a, b))
    return pairs


def _cluster_pairs(clusters_ds):
    comps = {}
    for r in clusters_ds.take_all():
        comps.setdefault(r["cluster_id"], set()).add(r["file_id"])
    pairs = set()
    for members in comps.values():
        for a, b in itertools.combinations(sorted(members), 2):
            pairs.add((a, b))
    return pairs


def test_near_dup_recall_ge_99():
    fx = fx_near_dup()
    cfg = PipelineConfig(verify_threshold=0.5)
    oracle = _oracle_pairs(fx, cfg)
    assert oracle, "fixture must contain near-dup pairs"
    clusters = dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg)
    got = _cluster_pairs(clusters)
    recall = len(got & oracle) / len(oracle)
    assert recall >= 0.99, f"recall {recall:.3f} < 0.99 ({len(oracle)} oracle pairs)"


def test_salting_preserves_connectivity():
    """skew_boilerplate with a tiny salt threshold: the repeated license /
    stub files must still land in single clusters (star+chain+anchor edges
    preserve connectivity through salted sub-buckets)."""
    fx = fx_skew_boilerplate(n_repos=120)
    cfg = PipelineConfig(salt_threshold=16, max_bucket_pairs=8,
                         verify_threshold=0.5)
    # no exact collapse: force the skewed buckets to actually form
    clusters = dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg,
                                       collapse_exact=False)
    comp = {}
    for r in clusters.take_all():
        comp[r["file_id"]] = r["cluster_id"]
    for grp in fx.exact_groups:  # license family, stub family
        labels = {comp.get(f) for f in grp}
        assert len(labels) == 1 and None not in labels, \
            f"family split into {len(labels)} clusters"


def test_exact_families_fold_into_clusters():
    """Members of an exact family inherit the representative's cluster."""
    t = pa.table({
        "repo": ["r"] * 4, "path": ["a.py", "b.py", "c.py", "u.py"],
        "commit": ["c"] * 4, "lang": ["py"] * 4,
        "content": [
            "def f():\n    return compute(x) + compute(y) + compute(z)\n" * 4,
            "def f():\n    return compute(x) + compute(y) + compute(z)\n" * 4,
            "def f():\n    return compute(x) + compute(y) + compute(q)\n" * 4,
            "completely unrelated tiny file",
        ]})
    cfg = PipelineConfig(verify_threshold=0.5)
    clusters = dedup.near_dup_clusters(rd.from_arrow(t), cfg)
    comp = {r["file_id"]: r["cluster_id"] for r in clusters.take_all()}
    fa, fb, fc = (file_id("r", "c", p) for p in ["a.py", "b.py", "c.py"])
    fu = file_id("r", "c", "u.py")
    assert comp[fa] == comp[fb] == comp[fc]
    assert fu not in comp


def test_fused_edges_match_modular_plan():
    """The fused int-indexed candidate+verify fast path must emit exactly
    the edge set of the modular plan (candidate_pairs -> verify_pairs ->
    dedup_edges) on unsalted input — the fusion is a physical-plan change
    only. (Salted buckets legitimately differ in sub-bucket assignment:
    modular salts by hash(file_id), fused by hash(idx); connectivity is
    pinned separately by test_salting_preserves_connectivity.)"""
    fx = fx_near_dup()
    cfg = PipelineConfig(verify_threshold=0.5)
    hashed = exact.hash_corpus(rd.from_arrow(fx.table()), cfg,
                               keep_content=True).materialize()
    sigs = minhash.sign_corpus(hashed, cfg).materialize()

    fused = lsh.fused_candidate_edges(sigs, cfg)
    assert fused is not None
    fused_set = {(r["src"], r["dst"]) for r in fused.take_all()}

    bands = minhash.explode_bands(sigs, cfg)
    modular = lsh.dedup_edges(
        lsh.verify_pairs(lsh.candidate_pairs(bands, cfg), sigs, cfg))
    modular_set = {(r["src"], r["dst"]) for r in modular.take_all()}

    assert fused_set == modular_set
    assert fused_set, "fixture must produce candidate edges"


def test_scale_paths_match_fast_paths():
    """Force every driver fast path OFF (broadcast_limit=0 disables the
    fused LSH plan and the broadcast verify; driver_metadata_limit=0
    forces distributed representative election + family fold-in) and pin
    that the fully distributed plan produces the identical cluster map."""
    fx = fx_near_dup()
    fast_cfg = PipelineConfig(verify_threshold=0.5)
    slow_cfg = PipelineConfig(verify_threshold=0.5, broadcast_limit=0,
                              driver_metadata_limit=0, num_partitions=4)
    t = rd.from_arrow(fx.table())
    fast = {r["file_id"]: r["cluster_id"]
            for r in dedup.near_dup_clusters(t, fast_cfg).take_all()}
    slow = {r["file_id"]: r["cluster_id"]
            for r in dedup.near_dup_clusters(t, slow_cfg).take_all()}
    assert fast == slow
    assert fast, "fixture must produce clusters"


def test_verify_prune_refits_broadcast():
    """When the signature relation exceeds the broadcast budget, verify
    prunes it to the candidate-edge endpoints and re-checks the budget —
    a budget between |endpoints| and |sigs| must take the pruned-broadcast
    plan and emit exactly the full-broadcast plan's edges."""
    fx = fx_near_dup()
    cfg = PipelineConfig(verify_threshold=0.5)
    hashed = exact.hash_corpus(rd.from_arrow(fx.table()), cfg,
                               keep_content=True).materialize()
    sigs = minhash.sign_corpus(hashed, cfg).materialize()
    bands = minhash.explode_bands(sigs, cfg)
    cand = lsh.dedup_edges(lsh.candidate_pairs(bands, cfg)).materialize()
    n_ends = len({r["src"] for r in cand.take_all()}
                 | {r["dst"] for r in cand.take_all()})
    n_sigs = sigs.count()
    assert n_ends < n_sigs, "fixture needs docs outside any candidate pair"

    full = {(r["src"], r["dst"])
            for r in lsh.verify_pairs(cand, sigs, cfg).take_all()}
    pruned = {(r["src"], r["dst"]) for r in lsh.verify_pairs(
        cand, sigs, cfg, broadcast_limit=n_ends).take_all()}
    joined = {(r["src"], r["dst"]) for r in lsh.verify_pairs(
        cand, sigs, cfg, broadcast_limit=0).take_all()}
    assert pruned == full
    assert joined == full
    assert full, "fixture must produce verified edges"


def test_salting_preserves_connectivity_modular_int_chain():
    """Same connectivity invariant as test_salting_preserves_connectivity,
    but with every driver fast path forced OFF (broadcast_limit=0) so the
    salted buckets, star+chain bridge edges and pair dedup all run through
    the compact int-id modular chain."""
    fx = fx_skew_boilerplate(n_repos=120)
    cfg = PipelineConfig(salt_threshold=16, max_bucket_pairs=8,
                         verify_threshold=0.5, broadcast_limit=0,
                         num_partitions=4)
    clusters = dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg,
                                       collapse_exact=False)
    comp = {r["file_id"]: r["cluster_id"] for r in clusters.take_all()}
    for grp in fx.exact_groups:
        labels = {comp.get(f) for f in grp}
        assert len(labels) == 1 and None not in labels, \
            f"family split into {len(labels)} clusters"


def test_with_int_ids_dense_and_invertible():
    """with_int_ids assigns a dense 0..n-1 int_id over the pinned relation
    and returns the file_id array in id order: file_ids[int_id] must invert
    the mapping exactly, across multiple blocks."""
    fx = fx_near_dup()
    cfg = PipelineConfig()
    hashed = exact.hash_corpus(rd.from_arrow(fx.table()), cfg,
                               keep_content=True).materialize()
    sigs = minhash.sign_corpus(hashed, cfg) \
        .repartition(4).materialize()
    ids_ds, fid_arr = minhash.with_int_ids(sigs)
    rows = ids_ds.select_columns(["file_id", "int_id"]).take_all()
    assert len(fid_arr) == sigs.count() == len(rows)
    assert sorted(r["int_id"] for r in rows) == list(range(len(rows)))
    fids = fid_arr.to_pylist()
    for r in rows:
        assert fids[r["int_id"]] == r["file_id"]
    # rank-id invariant: id order IS lexicographic order, so integer
    # min-label over any node set selects the same document as string
    # min-label — the property the post-union-find label translation
    # (lsh.translate_labels) relies on
    assert fids == sorted(fids)


def test_translate_edges_fallback_matches_broadcast():
    """translate_edges past the rep broadcast budget must fall back to the
    bucketed-join plan and emit exactly the broadcast plan's rows."""
    fids = pa.array([f"repo/f{i:03d}.py" for i in range(40)], pa.string())
    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 5, 7, 12], pa.int64()),
        "dst": pa.array([3, 2, 9, 30, 39], pa.int64()),
        "jaccard_est": pa.array([0.9, 0.8, 0.7, 0.6, 0.55], pa.float64()),
    }))
    broad = lsh.translate_edges(
        edges, fids, PipelineConfig()).take_all()
    dist = lsh.translate_edges(
        edges, fids, PipelineConfig(rep_broadcast_limit=0,
                                    num_partitions=4)).take_all()
    key = lambda r: (r["src"], r["dst"])
    assert sorted(broad, key=key) == sorted(dist, key=key)
    assert broad[0]["src"].startswith("repo/"), "ids must be translated"


def test_assign_all_total_assignment():
    """assign_all gives EVERY corpus row a cluster_id: duplicate-family
    members share their cluster, singletons self-label with their own
    file_id."""
    t = pa.table({
        "repo": ["r"] * 3, "path": ["a.py", "b.py", "solo.py"],
        "commit": ["c"] * 3, "lang": ["py"] * 3,
        "content": ["same content " * 20, "same content " * 20,
                    "one of a kind"]})
    cfg = PipelineConfig(verify_threshold=0.5)
    corpus = rd.from_arrow(t)
    clusters = dedup.near_dup_clusters(corpus, cfg)
    total = {r["file_id"]: r["cluster_id"]
             for r in dedup.assign_all(corpus, clusters, cfg).take_all()}
    fa, fb = file_id("r", "c", "a.py"), file_id("r", "c", "b.py")
    fs = file_id("r", "c", "solo.py")
    assert set(total) == {fa, fb, fs}
    assert total[fa] == total[fb]
    assert total[fs] == fs


def test_minhash_estimator_unbiased_over_many_pairs():
    """The multiply-add per-perm hash family must stay an UNBIASED
    Jaccard estimator (a structured family can pass the per-pair 4-sigma
    bound while being systematically high or low). Over 40 random pairs
    the mean error must sit within 3 standard errors of zero and the
    spread near the binomial sigma."""
    rng = np.random.Generator(np.random.PCG64(99))
    signer = minhash.MinHashSigner(PipelineConfig())
    errs = []
    for _ in range(40):
        n = int(rng.integers(300, 3000))
        base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))
        cut = int(n * float(rng.uniform(0.3, 0.95)))
        other = base[:cut] + "".join(
            chr(97 + int(c)) for c in rng.integers(0, 26, n - cut))
        j = true_jaccard(base, other)
        sig = signer.signature_matrix([base, other])
        errs.append(minhash.jaccard_estimate(sig[0], sig[1]) - j)
    errs = np.array(errs)
    se = 0.045 / np.sqrt(len(errs))   # sigma <= 0.5/sqrt(128) ~ 0.044
    assert abs(errs.mean()) < 3 * se, errs.mean()
    assert errs.std() < 0.08, errs.std()


def test_dedup_edges_packed_matches_unpacked():
    """The packed-uint64 dedup exchange (id_bound set) must emit exactly
    the unpacked plan's distinct pairs, across chunked and whole-partition
    reduce modes."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 500, size=4000).astype(np.int64)
    dst = rng.integers(0, 500, size=4000).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    base = sorted((r["src"], r["dst"]) for r in
                  lsh.dedup_edges(edges, 4).take_all())
    for chunk in (None, 128):
        packed = sorted((r["src"], r["dst"]) for r in
                        lsh.dedup_edges(edges, 4, chunk_rows=chunk,
                                        id_bound=500).take_all())
        assert packed == base, chunk
