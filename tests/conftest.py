from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from cis555_search_engine_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    """Small deterministic transcript corpus (t1-ish scale)."""
    from cis555_search_engine_spark.synth import generate_transcripts

    return generate_transcripts(n_convs=60, seed=42)


@pytest.fixture(scope="session")
def corpus_sdf(spark, corpus_pdf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(corpus_pdf, schema=schema).cache()


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from cis555_search_engine_spark.oracle import build_index

    docs = list(corpus_pdf[["conv_id", "turn_idx", "text"]].itertuples(index=False, name=None))
    return build_index(docs)


@pytest.fixture(scope="session")
def spark_index(corpus_sdf):
    from cis555_search_engine_spark.operators.index_build import build_index

    return build_index(corpus_sdf)
