"""CLI entry point: ``python -m deduplicate_ray.cli <corpus.parquet> [opts]``.

The reference CLI (``deduplicate.py:731-746``: ``dirs+ --debug --delete
--synology --analyze --manual``) re-expressed for a table engine: input is a
corpus Parquet path (not a filesystem walk), ``--delete`` becomes the
delete-list report (S6 → S5 table, by design), ``--synology`` maps to the
same exclude-glob vocabulary, ``--analyze`` stops after the duplicate
analysis. Designed to run under ``ray job submit`` on a cluster (the script
only calls ``ray.init(address=...)`` when no session exists).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="deduplicate-ray",
        description="Ray-Data-native near-duplicate detection + clustering")
    p.add_argument("corpus", help="input corpus parquet path/dir "
                   "(repo, path, commit, lang, content)")
    p.add_argument("--out", default="/tmp/dedup_out",
                   help="output directory (parquet reports)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="stage checkpoint root (enables resume)")
    p.add_argument("--analyze", action="store_true",
                   help="stop after exact-dup analysis (reference --analyze)")
    p.add_argument("--manual-hashes", metavar="PARQUET", default=None,
                   help="use a previously written hashed relation directly "
                   "(the reference's --manual DB flag, deduplicate.py:738); "
                   "implies --analyze semantics over the cached hashes — "
                   "no corpus read, no re-hash")
    p.add_argument("--synology", action="store_true",
                   help="apply the reference's exclude globs (*/@*, */.*)")
    p.add_argument("--no-substring", action="store_true",
                   help="skip the Stage-3 containment pass")
    p.add_argument("--cascade", action="store_true",
                   help="faithful size/beg/rev hash cascade mode")
    # BooleanOptionalAction adds --no-complete-hash: the reference's
    # sampled-hash cascade mode (complete_hash=False, dupe_analysis.py:17)
    # was unreachable from the round-1 CLI (store_true with default=True)
    p.add_argument("--complete-hash", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="full-content hash as the final cascade key; "
                   "--no-complete-hash reproduces the reference's "
                   "sampled-hash (rev_hash) grouping")
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--verify-threshold", type=float, default=0.5)
    p.add_argument("--num-partitions", type=int, default=16)
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from deduplicate_ray.config import PipelineConfig, SYNOLOGY_EXCLUDES
    from deduplicate_ray.pipelines import dedup
    from deduplicate_ray.sources.corpus import read_corpus, validate_schema
    from deduplicate_ray.stages import exact

    from deduplicate_ray.state.checkpoint import input_fingerprint_of

    cfg = PipelineConfig(
        cascade=args.cascade, complete_hash=args.complete_hash,
        excludes=SYNOLOGY_EXCLUDES if args.synology else (),
        shingle_k=args.shingle_k, num_perms=args.num_perms,
        lsh_bands=args.bands, lsh_rows=args.num_perms // args.bands,
        verify_threshold=args.verify_threshold,
        num_partitions=args.num_partitions,
        checkpoint_dir=args.checkpoint_dir,
        input_fingerprint=input_fingerprint_of(args.corpus))

    if args.manual_hashes:
        import ray.data as rd
        hashes = rd.read_parquet(args.manual_hashes)
        members = exact.exact_members(hashes, cfg)
        members.write_parquet(f"{args.out}/exact_members")
        print(json.dumps({"exact_dup_rows": members.count(),
                          "out": args.out, "hashes": args.manual_hashes}))
        return 0

    corpus = validate_schema(read_corpus(args.corpus))

    if args.analyze:
        hashes = exact.hash_corpus(corpus, cfg).materialize()
        members = exact.exact_members(hashes, cfg)
        hashes.write_parquet(f"{args.out}/hashes")
        members.write_parquet(f"{args.out}/exact_members")
        n = members.count()
        print(json.dumps({"exact_dup_rows": n, "out": args.out}))
        return 0

    results = dedup.full_dedup(corpus, cfg)
    for name in ["exact_members", "clusters", "rollup", "report"]:
        results[name].write_parquet(f"{args.out}/{name}")
    # S5 parity: the reference's dupe_list.csv (deduplicate.py:690-719)
    results["report"].write_csv(f"{args.out}/dupe_list_csv")
    from deduplicate_ray.stages.rollup import freed_bytes
    print(json.dumps({
        "exact_dup_rows": results["exact_members"].count(),
        "clustered_rows": results["clusters"].count(),
        "freed_bytes_if_deleted": freed_bytes(results["report"]),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
