from raft_spark.functions import arrays, rng  # noqa: F401
