"""Large-scale training-data-pipeline operators (BASELINE.json north star):

- ``text``       : tokenization, quality scoring, language-ID, fingerprints
- ``dedup``      : exact (hash-groupBy), MinHash+LSH, SimHash near-dup
- ``similarity`` : embedding cosine top-k (brute force + LSH-bucketed)
- ``multimodal`` : binary-column plumbing with stubbed decoders

All hot paths are pure Column expressions / higher-order functions (JVM,
codegen); the only Python is the clearly-marked multimodal decode stubs.
"""
