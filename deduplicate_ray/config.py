"""Pipeline configuration.

Mirrors the reference's user-extension surface (CLI flags
``deduplicate.py:731-746`` and ``DupeAnalysis.__init__`` knobs
``dupe_analysis.py:17-19``: ``complete_hash``, ``db_root``, ``batch_limit``,
``excludes``) re-expressed for the Ray engine, plus the new Stage-2/3 knobs
demanded by the north rule (shingles, MinHash perms, LSH bands, salting,
checkpoints).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
import hashlib
import json


# The reference pre-assigns the sha1-of-empty constant to zero-size files
# (dupe_analysis.py:31, :335-340).  Our invariant hash is sha256, so the
# analogous constant is sha256(b"").
EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()

# Default exclude globs: the reference ships ['*/@*', '*/.*'] for --synology
# (dupe_analysis.py:29-30); we keep the same patterns as the default exclude
# vocabulary, matched against the `path` column.
DEFAULT_EXCLUDES: tuple[str, ...] = ()
SYNOLOGY_EXCLUDES: tuple[str, ...] = ("*/@*", "*/.*")


@dataclass
class PipelineConfig:
    # ---- Stage 1: exact dedup -------------------------------------------
    #: When True (the reference's default path is cascade; ``complete_hash``
    #: gates the full read, dupe_analysis.py:374-376) compute the faithful
    #: size → beg_hash → rev_hash cascade and only full-hash survivors.
    cascade: bool = False
    #: Reference ``complete_hash`` (dupe_analysis.py:17): with cascade=True
    #: and complete_hash=False the final grouping key is rev_hash — which can
    #: produce false-positive groups (pinned by the cascade_false_positive
    #: fixture); with complete_hash=True the key is the full hash.
    complete_hash: bool = True
    #: Chunk size for the sampled cascade hashes (reference chunk=1024,
    #: dupe_analysis.py:431).
    chunk: int = 1024
    #: fnmatch globs dropped before hashing (dupe_analysis.py:179-181).
    excludes: tuple[str, ...] = DEFAULT_EXCLUDES

    # ---- Stage 2: MinHash / LSH -----------------------------------------
    shingle_k: int = 5          # character 5-gram shingles (north_rule)
    num_perms: int = 128        # MinHash-128 (north_rule)
    lsh_bands: int = 32         # b bands ...
    lsh_rows: int = 4           # ... x r rows; b*r must equal num_perms
    minhash_seed: int = 42
    #: Jaccard-estimate threshold for candidate-pair verification
    #: (fraction of equal signature components). <=0 disables verification.
    verify_threshold: float = 0.5
    #: Band buckets larger than this are not expanded all-pairs; they emit
    #: star (to bucket representative) + chain (sorted-adjacent) edges, which
    #: preserves bucket connectivity for union-find while bounding the edge
    #: count linearly. Truncations are logged.
    max_bucket_pairs: int = 64
    #: Salt buckets bigger than this into sub-buckets for shuffle-skew
    #: control (north_rule skew clause).
    salt_threshold: int = 4096

    # ---- Stage 3: substring containment ---------------------------------
    #: Column used to scope the per-partition suffix-array pass. Containment
    #: is only detected *within* a partition group — the documented
    #: partitioning assumption of Stage 3.
    substring_partition_col: str = "repo"
    #: Skip containment for contents shorter than this (noise floor).
    min_containment_len: int = 32
    #: A partition group whose total content bytes exceed this is split
    #: into length-ordered shards of ~cap bytes, bounding one scan task's
    #: memory (a monorepo-sized group would otherwise concatenate whole
    #: inside one worker). Individual documents larger than the cap must
    #: still fit a worker.
    substring_group_bytes_cap: int = 256 << 20
    #: Expected byte gap between content-defined anchor windows used to
    #: route oversized-group queries only to shards holding a candidate
    #: host (see stages/substring.py). Smaller gap = fewer anchorless
    #: (fanout-fallback) docs but a bigger narrow anchor relation
    #: (~16/gap bytes per content byte).
    substring_anchor_gap: int = 128
    #: Driver-side budget (rows) for the (query, shard) visit list of the
    #: anchored routing; past it the stage falls back to the exact
    #: length-pruned fanout for every query.
    substring_visits_budget: int = 5_000_000
    #: An anchor-key group larger than this (pathological shared gram)
    #: routes its queries to the fanout fallback instead of exploding
    #: queries x shards candidate pairs.
    substring_anchor_group_cap: int = 1_000_000

    # ---- execution ------------------------------------------------------
    batch_size: int = 1024          # rows per map_batches batch (wide text rows)
    #: signer batches are much smaller than general batches, for two
    #: measured reasons: (a) fine batches load-balance the long-tailed
    #: lognormal doc sizes, and (b) the signer chunks its shingle buffer
    #: internally to stay L1/L2-resident regardless of batch size — so the
    #: batch size only controls TASK granularity. 256 rows ≈ 1.2k tasks at
    #: 314k docs (32-row batches launched ~10k tasks whose scheduling
    #: overhead capped the stage's core-scaling at ~0.6)
    signer_batch_size: int = 256
    signer_concurrency: int | tuple[int, int] = (1, 4)  # MinHash actor pool (min, max)
    num_partitions: int = 16        # hash-join / shuffle partition count
    #: Band-scale exchange reduces yield their partition in chunks of at
    #: most this many rows (stages/exchange.py chunk_rows): no single
    #: output object has to fit the object store whole, so billion-pair
    #: relations stream out under spilling. 4M (src, dst) int64 rows
    #: ~ 64 MB per chunk. At bench scale partitions are far smaller and
    #: the mode degenerates to one chunk per partition.
    exchange_chunk_rows: int = 4_000_000
    #: When the narrow (file_id, sha256) metadata relation has at most this
    #: many rows, representative election and family fold-in run driver-side
    #: in pandas (one fetch of the pinned relation) instead of as
    #: distributed groupbys/joins — the metadata analog of the union-find
    #: driver fast path. Beyond the limit the distributed path runs.
    driver_metadata_limit: int = 2_000_000
    #: Broadcast budget (docs) for driver-resident LSH state: below it the
    #: fused candidate+verify fast path and the broadcast verify run; above
    #: it every stage uses the fully distributed plan (modular
    #: candidate_pairs → joined verify). Tests set 0 to force the scale
    #: path end-to-end.
    broadcast_limit: int = 500_000
    #: Broadcast budget (docs) for the POST-PRUNE verify matrix
    #: specifically. Wider than broadcast_limit because the broadcast
    #: state is the 16-bit-FOLDED signature matrix — 256 B/row vs ~1 KB/row
    #: of raw uint64 signatures — and it lives ONCE in the shared object
    #: store, read zero-copy by every worker (the per-worker copy that
    #: used to bound this gate is gone; see verify_fn's warm-touch note).
    #: 2M rows = 512 MB of plasma. Ignored (treated as 0) whenever
    #: broadcast_limit is 0 so tests can still force the scale path.
    verify_broadcast_limit: int = 2_000_000
    #: Broadcast budget (rep ids) for the Stage-1 representative FILTER.
    #: Deliberately much higher than the narrow-join broadcast limits:
    #: the alternative plan semi-joins the content-carrying relation,
    #: i.e. shuffles the whole corpus payload through the object store
    #: (measured: a 3.6M-row corpus spilled 4.6+ GB at 56 MB/s where the
    #: broadcast filter moves ~200 MB of ids once). ~70 B/id → the
    #: default is ~1.4 GB of broadcast state, the right trade up to
    #: O(10^7) distinct contents; beyond it the content shuffle is
    #: genuinely unavoidable and runs bucketed.
    rep_broadcast_limit: int = 20_000_000
    checkpoint_dir: str | None = None   # stage checkpoints live here when set
    resume: bool = True             # skip stages with a complete, matching manifest
    #: Identity of the INPUT corpus (set via
    #: ``state.checkpoint.input_fingerprint_of`` on the source paths).
    #: Recorded in every stage manifest and required to match on resume —
    #: running the same config over a different or updated corpus with a
    #: reused checkpoint_dir recomputes instead of returning stale results
    #: (the reference keys its cache on the input dir-set,
    #: dupe_analysis.py:38-43).
    input_fingerprint: str | None = None

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}x{self.lsh_rows}) "
                f"must equal num_perms ({self.num_perms})"
            )
        if self.shingle_k < 1:
            raise ValueError("shingle_k must be >= 1")

    def fingerprint(self) -> str:
        """Config fingerprint for checkpoint manifests.

        The analog of the reference's dir-set sha1 cache key
        (dupe_analysis.py:38-43), but over the *configuration* so a stale
        checkpoint from a different config is never silently reused (the
        reference's existence-only check, dupe_analysis.py:93-97, is a
        latent bug the manifest design fixes).
        """
        blob = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]
