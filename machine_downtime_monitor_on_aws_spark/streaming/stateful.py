"""Custom stateful streaming: exact change-only emission via
``applyInPandasWithState``.

SURVEY.md SS7(e): the reference's UI-reference maintenance keeps an
in-memory latest-status map across invocations and pushes a mutation
only when a machine's status actually changes, stamping the mutation
with the *processing time of the change* (``index.ts:177-186,206``).
A plain update-mode aggregation re-emits whenever the aggregate row
changes (including timestamp-only updates); this operator reproduces
the reference's exact semantics:

- state per machine: (status, event_epoch of that status);
- a batch's messages reduce to their event-time latest;
- output row emitted ONLY when the reduced status differs from the
  stored state (or the machine is new);
- ``changed_at_epoch`` = processing-time stamp of the change.

State is bounded (one tuple per machine) and checkpointed by Spark's
state store - the distributed replacement for Lambda container reuse
(T2).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "machine_id string, status string, status_epoch long, changed_at_epoch long"
)
STATE_SCHEMA = "status string, status_epoch long"


def _change_only(
    key: tuple[str],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    best_status: str | None = None
    best_key: tuple[Any, ...] | None = None
    for pdf in batches:
        for _, row in pdf.iterrows():
            k = (row["event_epoch"], row["__seq"])
            if best_key is None or k > best_key:
                best_key = k
                best_status = row["status"]
    if best_key is None:
        return
    prev_status = state.get[0] if state.exists else None
    # event-time regression guard: never let an older event overwrite
    # newer state (strictly better than the reference's
    # last-writer-wins, SURVEY.md T5)
    if state.exists and best_key[0] < state.get[1]:
        return
    state.update((best_status, int(best_key[0])))
    if best_status != prev_status:
        yield pd.DataFrame(
            {
                "machine_id": [key[0]],
                "status": [best_status],
                "status_epoch": [int(best_key[0])],
                "changed_at_epoch": [int(time.time())],
            }
        )


def change_feed_stateful(status_messages: DataFrame) -> DataFrame:
    """Wire the stateful operator over a stream of
    (machine_id, status, event_epoch, __seq) rows; returns the
    change-feed stream (append mode)."""
    return status_messages.groupBy("machine_id").applyInPandasWithState(
        _change_only,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
