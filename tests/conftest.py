from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = "/root/repo/data/img_sf0.02"


@pytest.fixture(scope="session")
def spark():
    from mapsplit_spark.session import get_spark

    s = get_spark("mapsplit-tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_dir():
    """Small deterministic images fixture (200 rows, with payload bytes)."""
    from mapsplit_spark.datagen import write_fixture_dir

    if not os.path.exists(os.path.join(FIXTURE_DIR, "images.parquet")):
        write_fixture_dir(FIXTURE_DIR, sf=0.02, with_bytes=True)
    return FIXTURE_DIR
