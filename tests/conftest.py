from __future__ import annotations

import pytest

from another_map_reduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Small local session for test speed; production sizing lives in
    # session.get_spark defaults and bench.py.
    s = get_spark(
        app_name="amrs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": str(1 * 1024 * 1024)},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
