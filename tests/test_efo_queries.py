"""CQ corpus (engine path) vs DuckDB oracle at sf0.001."""

import pytest

from knovexlite_spark.queries import efo
from tests.conftest import SF_SMALL
from tests.oracle_util import check_query


@pytest.mark.parametrize("name", sorted(efo.CQ_DEFS))
def test_cq_query(spark, name):
    check_query(spark, SF_SMALL, name, efo.queries()[name], efo.oracle_sql()[name])
