"""Pipeline corpus (dedup/text/similarity) vs DuckDB oracles at sf0.001."""

import pytest

from knovexlite_spark.queries import pipeline
from tests.conftest import SF_SMALL
from tests.oracle_util import check_query


@pytest.mark.parametrize("name", sorted(pipeline.ORACLES))
def test_pipeline_query(spark, name):
    check_query(
        spark, SF_SMALL, name, pipeline.queries()[name], pipeline.oracle_sql()[name]
    )
