"""Relational + pipeline operators.

- ``joins``      row-aligned (positional) merge, mapping-key join, FK remap
- ``dedup``      exact & near-duplicate detection (hash, MinHash-LSH,
                 SimHash, n-gram Jaccard, embedding cosine)
- ``similarity`` vector similarity search (brute-force + LSH-bucketed ANN)
- ``text``       language ID, quality scoring, token counts, fingerprints
- ``stats``      column profiling (≙ reference Stats subsystem)
- ``multimodal`` binary-column plumbing (decode/feature stubs)
"""
