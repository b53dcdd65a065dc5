"""Pipeline stages: exact dedup, MinHash/LSH, union-find, substring, rollup."""
