"""Resume protocol: a killed run resumes from the last completed stage and
produces identical output (SURVEY §5 item e; north_rule resumability)."""

import json
import os

import pytest
import ray.data as rd

from deduplicate_ray import PipelineConfig
from deduplicate_ray.fixtures import fx_near_dup
from deduplicate_ray.pipelines import dedup
from deduplicate_ray.state import checkpoint


def _clusters_map(ds):
    return {r["file_id"]: r["cluster_id"] for r in ds.take_all()}


def test_resume_reuses_early_stages_and_matches(tmp_path):
    fx = fx_near_dup(n_bases=8)
    root = str(tmp_path / "ckpt")
    cfg = PipelineConfig(verify_threshold=0.5, num_partitions=4,
                         checkpoint_dir=root)

    corpus = rd.from_arrow(fx.table())
    first = _clusters_map(dedup.near_dup_clusters(corpus, cfg))
    assert first

    # all stage manifests complete
    for stage in ["hashes", "signatures", "bands", "edges"]:
        m = checkpoint.load_manifest(root, stage)
        assert m and m["complete"], stage

    # simulate a crash after 'signatures': later stages lost
    for stage in ["bands", "edges"]:
        import shutil
        shutil.rmtree(checkpoint.stage_path(root, stage))

    sig_manifest_before = checkpoint.manifest_path(root, "signatures")
    mtime_before = os.path.getmtime(sig_manifest_before)

    second = _clusters_map(
        dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg))
    assert second == first
    # earlier stage was REUSED, not recomputed
    assert os.path.getmtime(sig_manifest_before) == mtime_before


def test_stale_fingerprint_forces_recompute(tmp_path):
    fx = fx_near_dup(n_bases=5)
    root = str(tmp_path / "ckpt")
    cfg1 = PipelineConfig(verify_threshold=0.5, num_partitions=4,
                          checkpoint_dir=root)
    dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg1).take_all()
    m1 = checkpoint.load_manifest(root, "signatures")

    # different shingle config -> different fingerprint -> stages recomputed
    cfg2 = PipelineConfig(verify_threshold=0.5, num_partitions=4,
                          checkpoint_dir=root, shingle_k=7)
    dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg2).take_all()
    m2 = checkpoint.load_manifest(root, "signatures")
    assert m1["fingerprint"] != m2["fingerprint"]


def test_manifest_carries_partition_lineage(tmp_path):
    fx = fx_near_dup(n_bases=5)
    root = str(tmp_path / "ckpt")
    cfg = PipelineConfig(verify_threshold=0.5, num_partitions=4,
                         checkpoint_dir=root)
    dedup.near_dup_clusters(rd.from_arrow(fx.table()), cfg).take_all()
    m = checkpoint.load_manifest(root, "signatures")
    assert m["rows"] > 0 and m["bytes"] > 0
    assert all(p["rows"] >= 0 and p["file"].endswith(".parquet")
               for p in m["partitions"])
    # manifest JSON is the durable contract — parseable from disk
    with open(checkpoint.manifest_path(root, "signatures")) as f:
        assert json.load(f)["complete"] is True


def test_unionfind_resumes_from_last_complete_round(tmp_path):
    """Distributed CC checkpoints each label round; deleting the last
    round (a mid-round kill) and re-running with the same dir resumes
    and reproduces the fresh-run labels exactly."""
    import shutil

    import pandas as pd
    import ray.data as rd

    from deduplicate_ray.state import unionfind

    # chain a0-a1-...-a9 plus a separate pair: 2 components, diameter 9
    edges = pd.DataFrame({
        "src": [f"a{i}" for i in range(9)] + ["z0"],
        "dst": [f"a{i+1}" for i in range(9)] + ["z1"]})

    def run(ckpt):
        return sorted(
            (r["node"], r["label"])
            for r in unionfind.connected_components(
                rd.from_pandas(edges), driver_limit=0, num_partitions=2,
                checkpoint_dir=str(ckpt)).take_all())

    d1 = tmp_path / "cc1"
    fresh = run(d1)
    assert {lab for _, lab in fresh} == {"a0", "z0"}
    rounds = sorted(p.name for p in d1.iterdir()
                    if p.name.startswith("round_") and p.name != "round_init")
    assert rounds, "expected checkpointed rounds"
    # kill the last complete round, resume in the same dir
    shutil.rmtree(d1 / rounds[-1])
    resumed = run(d1)
    assert resumed == fresh
    # and a fresh dir reproduces the same labels (determinism)
    assert run(tmp_path / "cc2") == fresh
