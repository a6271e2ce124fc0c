from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    """Small local session: 4 threads / 4 shuffle partitions — per-task
    scheduling overhead dominates at test scale, so fewer, larger tasks
    run faster than local[32] here."""
    from financial_big_data_exp_4_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "ml_fuzz: adversarial trainingset variants for the ML surface "
        "(run alone with `pytest -m ml_fuzz`)",
    )
