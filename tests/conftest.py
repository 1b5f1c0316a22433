from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rad_database_parse_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_session(app_name="rad_database_parse_spark_tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_session_holder():
    """Alias fixture for hypothesis-driven tests (hypothesis forbids function-
    scoped fixtures under @given; session scope is fine)."""
    return get_session(app_name="rad_database_parse_spark_tests")
