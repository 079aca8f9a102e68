import pytest


@pytest.fixture(scope="session")
def spark():
    from alligator_spark.session import get_spark

    s = get_spark(app_name="alligator_spark_tests", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_spec():
    from alligator_spark.datagen import CorpusSpec

    return CorpusSpec(n_entities=20, dups_per_entity=3, n_distractors=20, seed=42)


@pytest.fixture(scope="session")
def smoke_docs(spark, smoke_spec):
    from alligator_spark.datagen import generate_docs

    df = generate_docs(spark, smoke_spec).cache()
    df.count()
    return df
