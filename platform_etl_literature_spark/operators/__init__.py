"""Large-scale dataset operators (training-data pipeline surface).

Each operator is a DataFrame → DataFrame function built from Catalyst
primitives (no row-at-a-time Python in the hot path). They extend the
reference pipeline's relational core with the operations a 100 TB
training-data pipeline needs: dedup, similarity search, text analysis,
sessionization, multimodal column plumbing.
"""
