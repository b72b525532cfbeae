from __future__ import annotations

import shutil
import tempfile

import pytest

from gondar_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="gondar_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        arrow_batch_rows=128,
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="gondar_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
