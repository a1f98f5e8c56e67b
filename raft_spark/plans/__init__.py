from raft_spark.plans.audit import audit_plan, PlanReport  # noqa: F401
