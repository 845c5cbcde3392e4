"""CQ corpus (engine path) vs DuckDB oracle at sf0.001.

Per-type coverage: every one of the 13 CQ types is checked against its
own oracle via ``efo._runner``/``CQ_ORACLE``; the grouped (tagged-union)
gate rows the driver sees are checked too.
"""

import pytest

from knovexlite_spark.queries import efo
from tests.conftest import SF_SMALL
from tests.oracle_util import check_query


@pytest.mark.parametrize("name", sorted(efo.CQ_DEFS))
def test_cq_type(spark, name):
    check_query(spark, SF_SMALL, name, efo._runner(name), efo.CQ_ORACLE[name])


@pytest.mark.parametrize("name", sorted(efo.CQ_GROUPS))
def test_cq_gate_row(spark, name):
    check_query(spark, SF_SMALL, name, efo.queries()[name], efo.oracle_sql()[name])
