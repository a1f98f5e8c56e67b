"""Registry of correctness-gate queries + DuckDB oracles.

Each submodule registers operator queries via the ``@query`` decorator.
Naming/typing conventions are documented in __spark_entry__.py.
"""

from __future__ import annotations

from raft_spark.queries.registry import QUERIES, ORACLES, query  # noqa: F401

# Import for registration side-effects.
from raft_spark.queries import text_queries  # noqa: F401, E402
from raft_spark.queries import dense_queries  # noqa: F401, E402
from raft_spark.queries import stats_queries  # noqa: F401, E402
from raft_spark.queries import sparse_queries  # noqa: F401, E402
from raft_spark.queries import pipeline_queries  # noqa: F401, E402
from raft_spark.queries import rng_queries  # noqa: F401, E402
from raft_spark.queries import solver_queries  # noqa: F401, E402
from raft_spark.queries import streaming_queries  # noqa: F401, E402
from raft_spark.queries import matrix_queries  # noqa: F401, E402
from raft_spark.queries.text_queries import flagship  # noqa: F401, E402
