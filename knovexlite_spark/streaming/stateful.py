"""Custom stateful streaming operators via ``applyInPandasWithState``
(the brief's escape hatch for operators the built-in windows can't
express).

``running_user_stats`` keeps per-user running (count, sum, max) state
across micro-batches and emits the updated row each time the user
appears — the canonical keyed-state shape: state is per group key,
lives in the state store, and survives across triggers.  Batch parity:
after the source drains, the latest row per user equals the batch
aggregation (pinned by tests).

Scale notes: state is partitioned by the group key like any keyed
stream; a timeout (``GroupStateTimeout``) bounds state growth for
keys that go quiet — demonstrated here with NoTimeout because the test
source is finite.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"


def _update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [s],
            "max_value": [m],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats with keyed state (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
