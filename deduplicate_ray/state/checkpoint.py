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
    try:
        with open(p) as f:
            return json.load(f)
    except json.JSONDecodeError:
        # truncated manifest (crash mid-write): treat the stage as
        # incomplete and recompute rather than failing every resume
        return None


def is_complete(root: str, stage: str, fingerprint: str,
                input_fingerprint: str | None = None) -> bool:
    """A stage is reusable only when its manifest is complete AND both the
    config fingerprint and (when the caller tracks one) the INPUT
    fingerprint match — resume=True on a reused checkpoint_dir with a
    different or updated corpus must recompute, not silently return stale
    results (the reference keys its cache on a sha1 of the input dir-set,
    dupe_analysis.py:38-43; ADVICE round 1)."""
    m = load_manifest(root, stage)
    if not (m and m.get("complete") and m.get("fingerprint") == fingerprint):
        return False
    if input_fingerprint is not None:
        return m.get("input_fingerprint") == input_fingerprint
    return True


def write_stage(ds: rd.Dataset, root: str, stage: str, fingerprint: str,
                input_fingerprint: str | None = None) -> str:
    """Write ``ds`` as the checkpoint of ``stage``; manifest committed last
    (temp file + atomic rename, so a crash can never leave a manifest that
    parses but lies)."""
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
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "complete": True,
        "rows": total_rows,
        "bytes": total_bytes,
        "partitions": parts,
        "written_at": time.time(),
    }
    if input_fingerprint is not None:
        manifest["input_fingerprint"] = input_fingerprint
    mp = manifest_path(root, stage)
    mp_tmp = mp + ".tmp"
    with open(mp_tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(mp_tmp, mp)
    return final


def read_stage(root: str, stage: str) -> rd.Dataset:
    return rd.read_parquet(stage_path(root, stage))


def input_fingerprint_of(paths) -> str:
    """Input-identity fingerprint: sha256 over the sorted source file list
    with sizes + mtimes — the analog of the reference's sha1 of the sorted
    dir-set (dupe_analysis.py:38-43), strengthened with content-change
    signals so an updated corpus invalidates the cache."""
    import hashlib
    if isinstance(paths, str):
        paths = [paths]
    entries = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                fp = os.path.join(p, name)
                if os.path.isfile(fp):
                    st = os.stat(fp)
                    entries.append(f"{fp}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.isfile(p):
            st = os.stat(p)
            entries.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        else:
            entries.append(p)
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()[:16]


def checkpointed(factory, root: str | None, stage: str, fingerprint: str,
                 resume: bool = True,
                 input_fingerprint: str | None = None) -> rd.Dataset:
    """Run ``factory()`` under the checkpoint protocol.

    With no ``root``: just ``factory()`` (in-memory pipeline). With a root:
    reuse a complete checkpoint whose config AND input fingerprints match;
    otherwise compute, write, and hand back the durable copy (so
    downstream lineage reads Parquet, not the recomputation graph).
    """
    if not root:
        return factory()
    if resume and is_complete(root, stage, fingerprint, input_fingerprint):
        return read_stage(root, stage)
    ds = factory()
    write_stage(ds, root, stage, fingerprint, input_fingerprint)
    return read_stage(root, stage)
