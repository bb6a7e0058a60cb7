from __future__ import annotations

import datetime as dt
import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from powa_archivist_spark.session import get_spark  # noqa: E402
from powa_archivist_spark.storage import Warehouse  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("powa_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def wh(spark):
    d = tempfile.mkdtemp(prefix="powa_wh_")
    yield Warehouse(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def ts(minute: int, second: int = 0) -> dt.datetime:
    """Deterministic snapshot timestamps (UTC)."""
    return dt.datetime(2026, 1, 1, 12, minute, second, tzinfo=dt.timezone.utc)
