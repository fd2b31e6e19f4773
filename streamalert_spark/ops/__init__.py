"""Large-scale training-data pipeline operators.

Beyond reference parity (BASELINE.json north star): deduplication,
similarity search, text analysis, and multimodal-column plumbing, each as a
composable DataFrame transform designed for 100 TB inputs — no driver-side
collects, broadcast/bucketed joins, LSH-style candidate generation so the
pairwise stages never go quadratic at scale.

Determinism note: every hash here is md5-of-string, never engine-native
hash(), so results are reproducible across engines (the DuckDB oracle
computes the same values).
"""
