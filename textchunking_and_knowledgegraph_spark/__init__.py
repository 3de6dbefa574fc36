"""PySpark-native knowledge-graph construction engine.

A from-scratch, fully distributed re-expression of the semantics of the
reference pipeline ``Zimo05/TextChunking_and_KnowledgeGraph`` (a single-process,
LLM-API-in-the-loop Python tool): markdown/section-tree parsing, 600-1000 char
"LumberChunker" text chunking, (subj, pred, obj) triple emission, dictionary
entity linking with MinHash-LSH candidate blocking, connected-components
canonicalization, and vertex/edge graph materialization -- all as DataFrame
flows over an Iceberg-style source table ``(repo, path, commit, lang, content)``.

Everything "smart" in the reference (DeepSeek/Dify/MinerU HTTP calls) is
replaced by deterministic rule/pattern extractors so results are reproducible.

Layout:
  sources/    -- table IO seam (parquet local / iceberg cluster), synthetic fixtures
  functions/  -- column-expression text functions (normalizer, splitters, scoring)
  operators/  -- chunker, extractors, linking, canonicalization, dedup, ANN, graph ops
  plans/      -- end-to-end pipeline + materialization (commit manifest, lineage)
  streaming/  -- structured-streaming variants (events)
"""

__version__ = "0.1.0"
