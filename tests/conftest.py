import pytest

from medical_and_charity_document_extraction_system_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from medical_and_charity_document_extraction_system_spark.sources import synthesize_pages

    df = synthesize_pages(spark, SF_SMALL).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def extracted_small(spark, pages_small):
    from medical_and_charity_document_extraction_system_spark.plans import run_extraction

    df = run_extraction(pages_small).cache()
    df.count()
    return df
