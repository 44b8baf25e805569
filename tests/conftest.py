import pytest


@pytest.fixture(scope="session")
def spark():
    from pyjelly_spark.session import build_session

    session = build_session(master="local[4]", shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def source_files_500(spark):
    from pyjelly_spark.sources.source_repos import generate_source_files

    df = generate_source_files(spark, 500).cache()
    df.count()
    return df
