from __future__ import annotations

import pytest

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (
    build_session,
)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = build_session(
        app_name="engine-tests", master="local[4]", shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
