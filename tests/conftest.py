from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = os.environ.get("KWACK_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("KWACK_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from kwack_spark.session import get_session

    s = get_session(app_name="kwack-tests", shuffle_partitions=8)
    yield s
    s.stop()
