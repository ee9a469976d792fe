"""Shared pytest fixtures: one tuned SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# The oracle-parity SF; override to run the full battery at another
# scale (the round-close ritual: SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1
# python -m pytest tests/test_oracle_parity.py).
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cpus=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
