import pytest


@pytest.fixture(scope="session")
def spark():
    from pdfplumber_golang_spark.session import get_spark

    s = get_spark(app="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
