"""Plan-hygiene regression net over every entry query.

Asserts the physical plan of each ``__spark_entry__.queries()`` entry
contains no CartesianProduct (unconditioned cross join — always a bug
at 10^10-row scale) and no BatchEvalPython (row-at-a-time pickled
Python UDF; the only sanctioned Python boundaries are Arrow-vectorized:
ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

This turns the per-round manual plan audit into a test: a future edit
that accidentally drops a join condition or introduces a non-Arrow UDF
fails here, not in a 100 TB run. ``tools/plan_audit.py`` writes the
same plans as reviewable artifacts under BENCH/plans/.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from tools.plan_audit import RED_FLAGS, formatted_plan

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_entry_query_plan_is_clean(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    plan = formatted_plan(df)
    hits = [f for f in RED_FLAGS if f in plan]
    assert not hits, f"{name}: forbidden plan nodes {hits}\n{plan[:2000]}"
