"""Tests for the training-data-pipeline operators: text analysis,
similarity search, SimHash / n-gram / embedding dedup, multimodal plumbing,
windows, and the checkpoint protocol."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deduplicate_ray import PipelineConfig
from deduplicate_ray.functions import text as textfn
from deduplicate_ray.stages import multimodal, simdedup, similarity, windows
from deduplicate_ray.state import checkpoint


# ---------------------------------------------------------------- text

def test_token_count_ws_matches_sql_semantics():
    # DuckDB: array_length(regexp_split_to_array(trim(text), '\s+'))
    assert textfn.token_count_ws("a  b\tc") == 3
    assert textfn.token_count_ws("  hello  ") == 1
    assert textfn.token_count_ws("") == 1  # empty token, SQL parity
    assert textfn.token_count_ws("one") == 1


def test_token_count_ws_column_parity():
    """Vectorized RE2 column kernel == the scalar Python kernel on every
    oracle-relevant shape (empty, all-space, tabs/newlines, nulls →
    md5('')-style empty semantics, unicode text with ASCII whitespace)."""
    texts = ["a  b\tc", "  hello  ", "", "one", "a\nb\r\nc d", "   ",
             "x", "naïve café  über", "a" * 500 + " b", None]
    col = pa.chunked_array([pa.array(texts[:4], pa.string()),
                            pa.array(texts[4:], pa.string())])
    out = textfn.token_count_ws_column(col).to_pylist()
    expect = [textfn.token_count_ws(t or "") for t in texts]
    assert out == expect
    assert textfn.token_count_ws_column(
        pa.array([], pa.large_string())).to_pylist() == []


def test_quality_and_lang_guess():
    an = textfn.TextAnalyzer()
    assert an.guess_lang("the cat and the dog of a house is that it") == "en"
    assert an.guess_lang("der hund und die katze ist von ein haus") == "de"
    assert an.guess_lang("") == "unknown"
    q = textfn.quality_frame(["abc def!", ""])
    assert q["n_chars_q"][0] == 8 and q["n_chars_q"][1] == 0
    assert 0 < q["punct_ratio"][0] < 0.2


def test_fingerprint_stable_and_edit_robust():
    base = "x" * 50 + "the quick brown fox jumps over the lazy dog " * 20
    assert textfn.rolling_fingerprint(base) == textfn.rolling_fingerprint(base)
    # appending at the end usually keeps the min-window fingerprint
    assert textfn.rolling_fingerprint(base) == textfn.rolling_fingerprint(base + "zz")


# ---------------------------------------------------------------- similarity

def _emb_ds(n=100, d=16, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), d),
    })
    return rd.from_arrow(t), vecs


def test_knn_cosine_matches_numpy_bruteforce():
    ds, vecs = _emb_ds()
    q = vecs[:3].astype(np.float64)
    out = similarity.knn_cosine(ds, q, k=5, round_to=None).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = vn @ qn.T
    for qi in range(3):
        expect = set(np.argsort(-sims[:, qi])[:5].tolist())
        assert {v for v, _ in got[qi]} == expect


def test_knn_lsh_same_bucket_returns_self():
    ds, vecs = _emb_ds()
    q = vecs[:2].astype(np.float64)
    out = similarity.knn_cosine_lsh(ds, q, k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # each query vector is its own nearest neighbor and shares its own bucket
    assert 0 in by_q.get(0, set())
    assert 1 in by_q.get(1, set())


# ---------------------------------------------------------------- simdedup

def test_simhash_near_duplicates_close():
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliett kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu ")
    a = words * 4
    b = a.replace("zulu", "zebra", 1)  # single-token edit
    c = "completely different vocabulary entirely unrelated thing " * 12
    ha, hb, hc = (simdedup.simhash64(t) for t in (a, b, c))
    assert simdedup.hamming64(ha, hb) <= 6
    assert simdedup.hamming64(ha, hc) > 10


def test_simhash_edges_pipeline():
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    for i in range(4):
        rows.append({"doc_id": i, "text": base})
    rows.append({"doc_id": 99, "text": "nothing in common with the others at all " * 6})
    ds = rd.from_items(rows)
    edges = simdedup.simhash_edges(simdedup.add_simhash(ds), id_col="doc_id",
                                   max_hamming=3).take_all()
    pairs = {(r["src"], r["dst"]) for r in edges}
    assert (0, 1) in pairs and (2, 3) in pairs
    assert not any(99 in p for p in pairs)


def test_ngram_jaccard_edges():
    rows = [
        {"doc_id": 1, "text": "one two three four five six seven eight nine ten"},
        {"doc_id": 2, "text": "one two three four five six seven eight nine eleven"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon"},
    ]
    ds = rd.from_items(rows)
    edges = simdedup.ngram_jaccard_edges(ds, id_col="doc_id", n=3,
                                         threshold=0.5).take_all()
    pairs = {(r["src"], r["dst"]) for r in edges}
    assert (1, 2) in pairs and len(pairs) == 1


def test_ngram_jaccard_scale_path_matches_broadcast():
    """broadcast_limit=0 forces the bucketed-join scale path (hashed
    n-gram blobs, vectorized intersection); results must match the
    broadcast verify on the same input."""
    rows = [
        {"doc_id": 1, "text": "one two three four five six seven eight nine ten"},
        {"doc_id": 2, "text": "one two three four five six seven eight nine eleven"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 4, "text": "one two three four five six seven eight nine ten"},
    ]
    ds = rd.from_items(rows)
    fast = simdedup.ngram_jaccard_edges(ds, id_col="doc_id", n=3,
                                        threshold=0.5).take_all()
    scale = simdedup.ngram_jaccard_edges(ds, id_col="doc_id", n=3,
                                         threshold=0.5,
                                         broadcast_limit=0).take_all()
    as_set = lambda rows_: {(r["src"], r["dst"], round(r["jaccard"], 9))
                            for r in rows_}
    assert as_set(scale) == as_set(fast)
    assert any(r["src"] == 1 and r["dst"] == 2 for r in scale)


def test_blob_u64_view_nulls_and_slices():
    """The zero-copy blob viewer must handle null rows (count 0), empty
    blobs, chunked columns and sliced arrays (nonzero Arrow offset)."""
    import numpy as np
    import pyarrow as pa
    from deduplicate_ray.stages.simdedup import _blob_u64_view

    b1 = np.array([3, 1, 7], np.uint64).tobytes()
    b2 = np.array([9], np.uint64).tobytes()
    arr = pa.array([b1, None, b"", b2], pa.large_binary())
    vals, counts = _blob_u64_view(arr)
    assert counts.tolist() == [3, 0, 0, 1]
    assert vals.tolist() == [3, 1, 7, 9]
    # sliced: offsets no longer start at 0
    vals, counts = _blob_u64_view(arr.slice(1, 3))
    assert counts.tolist() == [0, 0, 1]
    assert vals.tolist() == [9]
    # chunked column
    ch = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 2)])
    vals, counts = _blob_u64_view(ch)
    assert counts.tolist() == [3, 0, 0, 1]
    assert vals.tolist() == [3, 1, 7, 9]


def test_loose_file_ingest_and_empty_dir_census(tmp_path):
    """S1 loose-file ingest + the A6 empty-dir census side table: files
    become corpus rows; the walk-time dirs table reports the directory
    with no files and no subdirs (reference dupe_analysis.py:636-642)."""
    from deduplicate_ray.sources import corpus as src
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.txt").write_text("hello world")
    (tmp_path / "b").mkdir()            # has a subdir only
    (tmp_path / "b" / "c").mkdir()      # truly empty
    rows = src.read_loose_files(str(tmp_path), repo="r").take_all()
    assert {r["path"].rsplit("/", 1)[-1] for r in rows} == {"x.txt"}
    dirs = src.scan_dirs(str(tmp_path), repo="r")
    empties = {r["dir"] for r in src.empty_dirs(dirs).take_all()}
    assert empties == {"r/b/c"}


def test_multiprobe_raises_embedding_recall():
    """1-bit multi-probe must recover pairs split by exactly one
    hyperplane: recall vs the exact pair set is measured, must improve on
    single-probe, and must never emit a pair below threshold."""
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((60, 12)).astype(np.float64)
    vecs = np.concatenate([base, base + 0.02 * rng.standard_normal((60, 12))])
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu, ju = np.triu_indices(len(vecs), k=1)
    exact_pairs = {(int(a), int(b)) for a, b in
                   zip(iu[sims[iu, ju] >= 0.98], ju[sims[iu, ju] >= 0.98])}
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float64()), 12)})
    ds = rd.from_arrow(t)

    def pairs_of(n_probe_bits):
        rows = simdedup.embedding_cosine_edges(
            ds, threshold=0.98, num_planes=8, n_probe_bits=n_probe_bits
        ).take_all()
        return {(int(r["src"]), int(r["dst"])) for r in rows}

    single, multi = pairs_of(0), pairs_of(1)
    assert single <= exact_pairs and multi <= exact_pairs  # no false pairs
    assert single < multi <= exact_pairs or single == exact_pairs
    assert len(multi) > len(single) or single == exact_pairs
    assert len(multi) / len(exact_pairs) >= 0.9


def test_embedding_cosine_edges_finds_duplicated_vector():
    rng = np.random.Generator(np.random.PCG64(9))
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[10] = vecs[3]  # exact duplicate vector
    t = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 16)})
    edges = simdedup.embedding_cosine_edges(
        rd.from_arrow(t), threshold=0.999).take_all()
    assert {(r["src"], r["dst"]) for r in edges} == {(3, 10)}


# ---------------------------------------------------------------- multimodal

def test_multimodal_featurize_schema():
    media = rd.from_arrow(multimodal.synth_media(n=8))
    out = multimodal.featurize_images(media, out_dim=16).take_all()
    assert len(out) == 8
    assert len(out[0]["features"]) == 16
    assert "payload" not in out[0]
    # deterministic across runs
    out2 = multimodal.featurize_images(
        rd.from_arrow(multimodal.synth_media(n=8)), out_dim=16).take_all()
    assert [r["features"] for r in sorted(out, key=lambda r: r["item_id"])] == \
           [r["features"] for r in sorted(out2, key=lambda r: r["item_id"])]


def test_multimodal_real_pil_decode():
    """Real decode path, exercised only where PIL is installed (this CI
    container has no codecs — the test self-skips): a solid-color PNG
    must featurize to its normalized intensity, and a corrupt payload
    must fall back to the deterministic stub instead of raising."""
    import io

    import numpy as np
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    img = PIL_Image.new("L", (20, 20), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    f = multimodal.ImageFeaturizer(out_dim=16)
    assert f.backend == "pil"
    feats = f._features(buf.getvalue())
    assert feats.shape == (16,)
    assert np.allclose(feats, 128 / 255.0, atol=1e-3)
    corrupt = f._features(b"not an image")
    assert corrupt.shape == (16,)


def test_multimodal_frame_sampler_explodes_rows():
    media = rd.from_arrow(multimodal.synth_media(n=5))
    out = multimodal.sample_frames(media, n_frames=3, frame_dim=8).take_all()
    assert len(out) == 15
    assert {r["frame"] for r in out} == {0, 1, 2}


# ---------------------------------------------------------------- windows

def test_tumbling_aggregate_matches_pandas():
    ts = pd.to_datetime([
        "2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 11:05",
        "2024-01-01 10:30", "2024-01-01 12:00"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2],
                       "ts": ts, "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = windows.tumbling_aggregate(rd.from_pandas(df), 3600).take_all()
    m = {(r["user_id"], str(r["window_start"])): (r["n_events"], r["value_sum"])
         for r in out}
    assert m[(1, "2024-01-01 10:00:00")] == (2, 3.0)
    assert m[(1, "2024-01-01 11:00:00")] == (1, 3.0)
    assert m[(2, "2024-01-01 12:00:00")] == (1, 5.0)


def test_hopping_aggregate_matches_duckdb():
    import duckdb
    rng = np.random.Generator(np.random.PCG64(5))
    n = 1500
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": (base + rng.integers(0, 30_000_000_000, n)
               .astype("timedelta64[us]")),
        "value": np.round(rng.random(n) * 100, 2)})
    got = windows.hopping_aggregate(
        rd.from_pandas(df).repartition(4), window_s=3600, hop_s=900
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        SELECT user_id, window_start,
               COUNT(*) AS n_events, ROUND(SUM(value), 4) AS value_sum
        FROM (SELECT e.user_id, e.value,
                     make_timestamp(((CAST(floor(epoch(e.ts)/900) AS BIGINT)
                                      - g.i) * 900) * 1000000) AS window_start
              FROM events e, generate_series(0, 3) g(i))
        GROUP BY user_id, window_start
    """).df()
    key = ["user_id", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n_events", "value_sum"]],
                                  want[key + ["n_events", "value_sum"]],
                                  check_dtype=False)
    # every event lands in exactly window/hop = 4 windows
    assert got["n_events"].sum() == 4 * n


def test_sessionize_gap_splits():
    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 12:00",
        "2024-01-01 12:20"])
    df = pd.DataFrame({"user_id": [7, 7, 7, 7], "ts": ts})
    out = windows.sessionize(rd.from_pandas(df), gap_s=1800).take_all()
    assert len(out) == 2
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [2, 2]


# ---------------------------------------------------------------- checkpoint

def test_checkpoint_write_resume(tmp_path):
    root = str(tmp_path)
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return rd.from_items([{"a": i} for i in range(10)])

    ds1 = checkpoint.checkpointed(factory, root, "stage1", "fp1")
    assert ds1.count() == 10 and calls["n"] == 1
    # resume: same fingerprint -> factory NOT called again
    ds2 = checkpoint.checkpointed(factory, root, "stage1", "fp1")
    assert ds2.count() == 10 and calls["n"] == 1
    # changed fingerprint -> recompute (fixes the reference's existence-only
    # cache check, dupe_analysis.py:93-97)
    ds3 = checkpoint.checkpointed(factory, root, "stage1", "fp2")
    assert ds3.count() == 10 and calls["n"] == 2
    m = checkpoint.load_manifest(root, "stage1")
    assert m["complete"] and m["rows"] == 10 and m["partitions"]


def test_config_fingerprint_changes_with_config():
    assert PipelineConfig().fingerprint() == PipelineConfig().fingerprint()
    assert PipelineConfig().fingerprint() != \
        PipelineConfig(shingle_k=7).fingerprint()


def test_ivf_recall_vs_brute():
    """IVF ANN (coarse k-means + n_probe lists) must recover >= 80% of the
    brute-force top-10 on a clustered embedding set when probing 1/4 of
    the lists (and exactly 100% when probing every list)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deduplicate_ray.stages import similarity

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16)) * 3
    vecs = np.concatenate([
        c + rng.standard_normal((150, 16)) * 0.4 for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 16)})).repartition(4)
    queries = vecs[::211][:5]

    brute = similarity.knn_cosine(emb, queries, k=10, round_to=None)
    truth = {}
    for r in brute.take_all():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    ivf = similarity.knn_cosine_ivf(emb, queries, k=10, n_lists=16,
                                    n_probe=4, sample_size=1200)
    got = {}
    for r in ivf.take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.8, f"IVF recall {hits}/{total}"

    full = similarity.knn_cosine_ivf(emb, queries, k=10, n_lists=16,
                                     n_probe=16, sample_size=1200)
    got_full = {}
    for r in full.take_all():
        got_full.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert all(got_full.get(q) == t for q, t in truth.items()), \
        "n_probe == n_lists must equal brute force"


def test_semdedup_matches_bruteforce_and_tiling(ray_session):
    """semdedup keep relation == brute-force 'exists earlier same-cluster
    row with cosine >= tau' on a corpus with planted duplicates, and the
    oversized-cluster tile path (tile_rows small) is bit-identical to the
    single-tile path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deduplicate_ray.stages.similarity import _normalize, semdedup

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((40, 16))
    # plant near-dups: rows 40..59 are jittered copies of rows 0..19
    dup = base[:20] + 0.01 * rng.standard_normal((20, 16))
    vecs = np.concatenate([base, dup])
    ids = np.arange(len(vecs), dtype=np.int64)
    emb = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    out = semdedup(emb, n_clusters=4, tau=0.9, seed=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(vecs)
    assert (~out["keep"]).sum() > 0  # the planted dups must drop

    # brute-force reference over the SAME cluster assignment
    # (float32 storage round-trip first, like the pipeline sees)
    v32 = vecs.astype(np.float32).astype(np.float64)
    vn = _normalize(v32)
    cl = out["sem_cluster"].to_numpy()
    sims = vn @ vn.T
    expect = np.ones(len(vecs), dtype=bool)
    for j in range(len(vecs)):
        earlier = (ids < ids[j]) & (cl == cl[j])
        if earlier.any() and sims[earlier, j].max() >= 0.9:
            expect[j] = False
    assert np.array_equal(out["keep"].to_numpy(), expect)

    tiled = semdedup(emb, n_clusters=4, tau=0.9, seed=1,
                     tile_rows=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert tiled.equals(out)


def test_semdedup_sizing_warning(ray_session, caplog):
    """The O(N^2/k) sizing guard: a projected mean cluster size above
    warn_cluster_rows logs a warning naming the recommended n_clusters;
    a well-sized run stays silent."""
    import logging
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deduplicate_ray.stages.similarity import semdedup

    rng = np.random.Generator(np.random.PCG64(3))
    vecs = rng.standard_normal((60, 8))
    emb = rd.from_arrow(pa.table({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    with caplog.at_level(logging.WARNING,
                         logger="deduplicate_ray.stages.similarity"):
        semdedup(emb, n_clusters=2, tau=0.9, seed=1,
                 warn_cluster_rows=10).count()
    assert any("n_clusters" in r.message and "sizing rule" in r.message
               for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="deduplicate_ray.stages.similarity"):
        semdedup(emb, n_clusters=4, tau=0.9, seed=1).count()
    assert not [r for r in caplog.records if "sizing rule" in r.message]


def test_pack_shards_matches_local_prefix_sum(ray_session):
    """Distributed two-level prefix sum == a local cumsum, on a gapped
    non-zero-based id space, across bucket counts (1 bucket = the
    degenerate single-group path; 64 > n rows = every row its own
    bucket range)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deduplicate_ray.stages.packing import pack_shards

    rng = np.random.Generator(np.random.PCG64(11))
    ids = np.sort(rng.choice(np.arange(1000, 9000), size=300,
                             replace=False)).astype(np.int64)
    w = rng.integers(0, 50, size=300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "weight": w})) \
        .repartition(8)
    start = np.cumsum(w) - w
    expect = start // 37
    for nb in (1, 5, 64):
        out = pack_shards(ds, budget=37, num_buckets=nb).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert np.array_equal(out["doc_id"].to_numpy(), ids), nb
        assert np.array_equal(out["shard"].to_numpy(), expect), nb


def test_pack_shards_empty_input(ray_session):
    """Empty (id, weight) input → empty (id, shard) output with the right
    schema, not a crash on the Min/Max bounds aggregate."""
    import pyarrow as pa
    import ray.data as rd
    from deduplicate_ray.stages.packing import pack_shards

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "weight": pa.array([], pa.int64())}))
    out = pack_shards(ds, budget=100)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "shard"}
