"""Dataflow operator library.

Operators the DataFrame API lacks as single calls — near-dup detection
(MinHash/LSH, SimHash, n-gram Jaccard), similarity search (brute-force and
LSH/IVF-bucketed ANN), idempotent upsert — each implemented as a composition
of built-in DataFrame ops (SURVEY.md §7 "custom operators" ladder: built-in
composition first, Pandas UDF second, mapPartitions last — everything here
stays on rung one).
"""
