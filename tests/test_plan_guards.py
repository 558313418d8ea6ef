"""Plan-shape regression guards over the ENTIRE gate query surface.

Every __spark_entry__.queries() entry is compiled (and, where operators
execute eagerly, run at sf0.001) and its physical plan asserted free of
the two shapes that do not survive 100 TB:

* CartesianProductExec — an unkeyed join that scales as |L|·|R| tasks.
  The intentional crossJoins in this repo (single-row broadcast dims:
  collected stopword sets, corpus-level IDF stats) compile to
  BroadcastNestedLoopJoin with a 1-row build side, which is bounded and
  allowed.
* Non-broadcast NestedLoopJoin — same blow-up through the sort-merge
  path.

This is the executable form of the per-operator plan audits in
BASELINE.md: a future edit that silently turns a keyed join into a
cartesian (e.g. dropping a join condition during a refactor) fails CI
instead of surfacing as a 100× cost at scale.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    # final physical plan before AQE execution — join strategy choices
    # are visible here; executing every query would make this test pay
    # the full gate cost for a structural assertion
    return df._jdf.queryExecution().sparkPlan().toString()


def _query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_no_cartesian_in_gate_query(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    plan = _plan_of(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    # NestedLoopJoin is only acceptable as a broadcast of a bounded dim
    for line in plan.splitlines():
        if "NestedLoopJoin" in line:
            assert "Broadcast" in line, (
                f"{name} plans a non-broadcast nested loop join:\n{plan}"
            )
