"""Training-data pipeline functions: text analysis, near-dup detection,
embedding similarity, multimodal plumbing.

These generalize the reference's extraction pipeline (the crawler's
scalar string functions, otodom/commons/extensions.go) into the
operations a large-scale training-data pipeline needs over the crawled
corpus: dedup, quality scoring, language ID, ANN search.  Everything is
Spark built-in expressions (whole-stage codegen) or Arrow-vectorized
pandas UDFs — no per-row Python (BASELINE.json input_hint rule).
"""
