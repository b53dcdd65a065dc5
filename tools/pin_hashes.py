"""Regenerate the pinned per-doc hash parquets that back the
simhash_pairs_docs / fingerprint_docs SQL oracles.

The pairing/report logic of those queries is verified INDEPENDENTLY by
DuckDB (hamming = bit_count(xor(a, b)) over the pinned simhash column;
see ORACLE_SQL); only the hash kernels themselves are pinned here. A
pytest test (tests/test_golden_rowsonly.py) recomputes both pins from
the testdata every run, so a kernel change fails loud instead of
silently shifting the oracle.

Usage: python tools/pin_hashes.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def build_tables(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from deduplicate_ray.functions import text as textfn
    from deduplicate_ray.stages import simdedup

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    sim = simdedup.add_simhash(docs).select_columns(["doc_id", "simhash"]) \
        .sort("doc_id").to_arrow_refs()
    import ray
    sim_t = pa.concat_tables([ray.get(r) for r in sim])
    fp = docs.map_batches(
        lambda t: textfn.add_fingerprint(t).drop_columns(["text"]),
        batch_format="pyarrow").sort("doc_id").to_arrow_refs()
    fp_t = pa.concat_tables([ray.get(r) for r in fp])
    return sim_t, fp_t


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sim_t, fp_t = build_tables(sf_dir)
    pq.write_table(sim_t, os.path.join(out_dir,
                                       "pinned_simhash_sf001.parquet"))
    pq.write_table(fp_t, os.path.join(out_dir,
                                      "pinned_fingerprint_sf001.parquet"))
    print(f"pinned {sim_t.num_rows} simhash rows, "
          f"{fp_t.num_rows} fingerprint rows -> {out_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
