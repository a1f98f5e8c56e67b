from raft_spark.sources.tables import (  # noqa: F401
    TABLES,
    load,
    load_all,
    embeddings_matrix,
    lineitem_matrix,
    doc_terms,
)
