"""sema_ray — a Ray-Data-native knowledge-graph-construction / data-processing
engine with the query and data-processing capabilities of akshitsinha/sema
(reference at /root/reference, snapshot 2026-01-09), rebuilt from scratch on
``ray.data.Dataset`` pipelines.

Layout
------
- :mod:`sema_ray.chunker`      — bit-exact port of the reference sliding-window
  chunker semantics (reference ``src/storage/processor.rs:31-85``).
- :mod:`sema_ray.hashing`      — content fingerprints (reference
  ``src/storage/mod.rs:72-94`` idea; blake2b stand-in for xxh3).
- :mod:`sema_ray.golden`       — the pure-Python reference triple extractor
  (mentions + rule-based relations); the P/R oracle for the pipeline.
- :mod:`sema_ray.embed`        — deterministic hash-projection embedder with the
  reference embedder interface (text -> unit-norm float32[384]; reference
  ``src/semantic/embeddings.rs``), as a map_batches actor class.
- :mod:`sema_ray.canonicalize` — MinHash/LSH blocking + union-find entity
  canonicalization.
- :mod:`sema_ray.pipelines.kg` — the flagship KG-construction pipeline.
- :mod:`sema_ray.relational`   — relational operators (filter/join/agg/topk/...)
  over the driver testdata, each with a DuckDB oracle.
- :mod:`sema_ray.textops`, :mod:`sema_ray.dedup`, :mod:`sema_ray.simsearch`
  — training-data-pipeline operators (language-ID, quality, dedup families,
  ANN search).
- :mod:`sema_ray.state.manifest` — per-partition lineage manifests and resume.

No module in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"

EMBED_DIM = 384  # reference: src/storage/lance_indexer.rs:43 pins dim=384
