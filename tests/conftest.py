from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
# Parity runs at the DRIVER'S scale (sf0.01) by default: round-1's
# decimal-rendering hash misses were invisible at sf0.001-only local
# runs (VERDICT.md r1 next-round item #1).
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from machine_downtime_monitor_on_aws_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()
