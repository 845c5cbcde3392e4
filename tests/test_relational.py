"""Every SURVEY §2.10 relational query vs the DuckDB oracle at sf0.001."""

import pytest

from knovexlite_spark.queries import relational
from tests.conftest import SF_SMALL
from tests.oracle_util import check_query

NAMES = sorted(relational.SHARED_SQL)


@pytest.mark.parametrize("name", NAMES)
def test_relational_query(spark, name):
    check_query(
        spark,
        SF_SMALL,
        name,
        relational.queries()[name],
        relational.oracle_sql()[name],
    )
