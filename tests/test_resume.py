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
