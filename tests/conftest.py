import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from webcrawler_spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp")
    s = get_spark(
        "webcrawler-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield s
    s.stop()
