from __future__ import annotations

import pytest

from webscraper_spark.session import get_spark
from webscraper_spark.synth import gen_corpus, to_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="webscraper_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Deterministic tiny corpus shared across tests (seed 42)."""
    return gen_corpus(n_urls=600, n_hosts=12, seed=42)


@pytest.fixture(scope="session")
def sdfs(spark, corpus):
    return to_spark(spark, corpus)
