"""Large-scale data-processing operators beyond the reference's surface:
windowed aggregation (packetbeat-flows analogue), sessionization,
dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality, token counts, fingerprints), multimodal stubs.
"""
