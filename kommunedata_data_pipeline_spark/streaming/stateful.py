"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only cross-run state is the landed-keys catalog (ST2);
the engine's extended surface adds arbitrary per-key streaming state —
the Spark-native replacement for any "remember what I saw for this key"
loop. State lives in the state store (checkpointed, partitioned by key),
so a 1000-executor cluster shards it horizontally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value total across micro-batches.

    Each batch updates the per-key state and emits the new running
    totals — the canonical applyInPandasWithState shape (per-key
    accumulator with explicit state schema). Over a single batch the
    emitted rows equal a plain groupBy aggregate, which gives this
    streaming-stateful operator an exact SQL oracle.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=COUNTS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
