"""Custom operators beyond the reference's surface (BASELINE.json north
star): deduplication, similarity search, text analysis, multimodal column
plumbing — the operations a large-scale training-data pipeline needs.

Each operator has (a) an exact, hash-checkable correctness surface and
(b) a documented 100TB scale path (LSH/banding/bucketing) whose output is
re-scored exactly so the semantics never change.
"""
