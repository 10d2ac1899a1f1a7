import pytest


@pytest.fixture(scope="session")
def spark():
    from octofludb_spark.session import get_spark

    s = get_spark(app="octofludb-spark-tests", cores=4, shuffle_partitions=4)
    yield s
