"""raft_spark — a PySpark-native analytics/ML-primitives engine.

Re-expresses the query and data-processing capabilities of rapidsai/raft
(reference snapshot 26.08.00) as idiomatic Spark DataFrame / SQL plans:

- dense row-vector math over ``(id, array<float>)`` tables
  (reference: ``cpp/include/raft/linalg``, ``cpp/include/raft/matrix``)
- sparse / COO long-form ops over ``(row, col, value)`` tables
  (reference: ``cpp/include/raft/sparse``)
- grouped reductions, top-k selection, statistics & model metrics
  (reference: ``cpp/include/raft/stats``, ``matrix/select_k.cuh``)
- text-statistics encodings TF-IDF / BM25
  (reference: ``sparse/matrix/preprocessing.cuh``)
- seeded random generation (reference: ``cpp/include/raft/random``)
- large-scale training-data pipeline extensions: dedup (exact /
  MinHash-LSH with cluster assignment / SimHash / n-gram Jaccard /
  embedding near-dup), similarity search (brute, LSH, IVF, PQ+ADC,
  IVF-PQ with persistent index), clustering (k-means, DBSCAN),
  pairwise distances, text curation (quality, repetition,
  decontamination, stratified rebalance, sequence packing), exact +
  sketch quantiles/cardinality, PageRank, JSONL corpus IO, multimodal
  plumbing, and streaming twins (windowed aggregates, sessionize,
  dedup, near-dup lookup, index ingest).

Everything is declared as a logical DataFrame plan so Catalyst/Tungsten
(predicate pushdown, column pruning, whole-stage codegen, AQE) pick the
physical strategy; Python UDFs appear only where built-in expressions
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from raft_spark.session import get_spark  # noqa: F401
