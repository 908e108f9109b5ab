from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"
REF = Path("/root/reference")


@pytest.fixture(scope="session")
def spark():
    from movie_data_pipeline_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def movies_csv() -> str:
    return str(REF / "movies.csv")


@pytest.fixture(scope="session")
def ratings_csv() -> str:
    return str(REF / "ratings.csv")
