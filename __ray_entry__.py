"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.
None of these functions (or the library code they use) calls ``ray.init`` /
``ray.shutdown`` — sessions are owned by the caller.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the 3-stage near-dup
    detector (sha256 exact pass → MinHash/LSH + union-find → substring
    containment) over the documents table adapted to the corpus schema,
    with total cluster assignment per row."""
    from deduplicate_ray import PipelineConfig
    from deduplicate_ray.pipelines import dedup
    from deduplicate_ray.sources.corpus import documents_as_corpus

    corpus = documents_as_corpus("/root/testdata/sf0.001")
    cfg = PipelineConfig(verify_threshold=0.5, num_partitions=4)
    clusters = dedup.near_dup_clusters(corpus, cfg, with_substring=True)
    return dedup.assign_all(corpus, clusters, cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (registry in deduplicate_ray/pipelines/queries.py)."""
    from deduplicate_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same output column names). Since
    round 4 the MinHash/SimHash/fingerprint/ANN pipelines carry real
    oracles too (DuckDB recomputes pairing/bucketing over pinned
    relations under tests/pinned_*); only the reference-parity keeper
    report and the multimodal stubs are intentionally absent →
    rows-only check, golden-pinned in tests/test_golden_rowsonly.py."""
    from deduplicate_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
