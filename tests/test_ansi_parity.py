"""ANSI-parity of the correctness gate (the r7 root gap).

The correctness driver runs the gate under ITS OWN SparkSession — a
Spark 4 default conf, where ``spark.sql.ansi.enabled`` is TRUE.
Through round 7 the repo's session factory pinned ANSI off, so an
entire class of expression-semantics divergences (invalid array index,
arithmetic overflow, bad cast — anything that throws under ANSI and
silently NULLs without it) was invisible to every local check and
surfaced only as a red driver row. That is exactly how the
``asof_join_broadcast`` ``element_at``-on-empty-array bug stayed
driver-red for two consecutive rounds while 239 local tests were
green.

This module closes the gap structurally:

  1. the session factory itself must now produce an ANSI-ON session
     (``session.py`` — local green and driver green are the same
     predicate again), and
  2. EVERY registered gate query must EXECUTE to completion at
     sf0.001 under an explicitly ANSI-ON conf. Value equality vs the
     DuckDB oracles is test_gate_immunity's job; this leg pins the
     weaker-but-orthogonal property that no gate expression THROWS
     under the driver's ANSI semantics (the failure mode value checks
     can never see, because the query dies first).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

QUERIES = entry.queries()


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The shared session, explicitly forced to ANSI-ON (and restored),
    so this leg keeps its meaning even if the session default drifts."""
    saved = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", saved)


def test_session_factory_defaults_to_ansi_on(spark):
    """The factory session must run the driver's predicate: ANSI ON
    (the Spark 4 default). Pinning it off in session.py is how the
    broadcast-as-of bug hid for two rounds — never again."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


# slow-marked mirrors of the gate-immunity set: these suite rows cost
# 20-65 s each just to EXECUTE; the default (driver-window) selection
# keeps ANSI coverage on every other query, the full suite runs all
_SLOW_MEMBERS = {
    "ann_recall_suite", "solver_spectra", "stream_lookup_suite",
    "curation_suite",
}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_MEMBERS else n
    for n in sorted(QUERIES)
])
def test_gate_query_executes_under_ansi(ansi_spark, sf_dir, name):
    # NOT .count(): Catalyst prunes unreferenced Projects and Window
    # operators under count(), so a projection-level ANSI throw — the
    # exact r6/r7 class, element_at(±1) on an empty candidate array in
    # a final select — survives a count-only check (verified:
    # range(3).select(element_at(array(), 1)).count() succeeds under
    # ansi=true while collect() throws). The noop sink consumes every
    # column of every row, so every output expression actually runs.
    QUERIES[name](ansi_spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
