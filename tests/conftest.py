from __future__ import annotations

import shutil
import tempfile

import pytest

from jitsu_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jitsu-spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="jitsu_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
