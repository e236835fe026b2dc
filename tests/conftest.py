from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kafka_stream_sorter_spark.session import get_spark

    s = get_spark("kss-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """Shared DuckDB connection with fixture views — one connect + view
    registration for the whole parity suite instead of one per test."""
    from .oracle_utils import duck_connect

    con = duck_connect(sf_dir)
    yield con
    con.close()
