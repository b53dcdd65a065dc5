"""deduplicate_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of ``sodrew/deduplicate``
(reference at /root/reference, studied for *what* it computes only) as idiomatic
Ray Data pipelines:

* Stage 1 — exact dedup: ``sha256(content)`` per row (vectorized
  ``map_batches`` over zero-copy Arrow batches) → ``groupby(sha256)`` →
  exact duplicate groups + deterministic representative election.
  Mirrors the reference's hash-collision semantics
  (``dupe_analysis.py:367-407``) including the optional faithful
  size → beg_hash → rev_hash → full_hash cascade.
* Stage 2 — near dedup: 5-gram shingle MinHash-128 signatures (stateful
  actor pool), LSH band explode, salted ``groupby`` on band keys, candidate
  pair generation, distributed union-find (min-label propagation) →
  cluster ids.
* Stage 3 — per-partition suffix-array substring containment pass
  (generalizes the reference's dead ``max_overlap`` DP,
  ``deduplicate.py:242-260``).
* Directory roll-up + greedy keeper election report
  (capability parity with ``deduplicate.py`` phase 2).

Input model (per BASELINE.json ``input_hint``): a Parquet table of
source-code repos with columns ``(repo, path, commit, lang, content)``,
all strings. Identity is ``file_id = repo || ':' || commit || ':' || path``.

The package never calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, CLI, or the pytest fixture).
"""

from deduplicate_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
