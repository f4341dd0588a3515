"""Custom stateful streaming operator: cross-trigger per-host politeness.

The batch politeness schedule (operators/politeness.py) restarts every
host's fetch sequence at each batch — correct inside one batch, but a
STREAMING deployment fetches across trigger boundaries, and the reference
semantics (one in-flight request per host, >= delay between requests —
IRLbot's per-host queues) must hold across them too: if trigger N ends
having scheduled host h at t=17.0s, trigger N+1's first fetch for h may
not be planned before 17.0s + delay.

That "last planned fetch per host" is genuine streaming state, expressed
Spark-first as `groupBy(host).applyInPandasWithState`:

  - grouping key: host_hash -> each host's sequence is owned by one task
    per trigger (the same serialization argument as the batch operator);
  - state (last_planned_at, seq): tiny and bounded by #hosts — unlike the
    URL-seen set (10^10 keys), which deliberately stays OUT of streaming
    state in the TableStore (see stream_loop.py module docstring);
  - inside the group: vectorized pandas (argsort by priority/key,
    cumulative offsets) — no per-row Python beyond the state API itself;
  - output planned_at continues monotonically across triggers (tested);
    a state timeout can GC hosts idle past the horizon — politeness of a
    host nobody fetches needs no memory.

Determinism: ordering inside a trigger is (priority, url_hash) — the
engine-wide tiebreak; planned times derive from state + delay only (no
wall clock), so replaying the same trigger sequence reproduces the same
schedule exactly.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

MIN_DELAY_S = 1.0

STATE_SCHEMA = StructType(
    [
        StructField("last_planned_at", DoubleType()),
        StructField("seq", LongType()),
    ]
)

OUT_FIELDS = [
    StructField("host_hash", LongType()),
    StructField("url_hash", LongType()),
    StructField("priority", DoubleType()),
    StructField("seq_in_host", LongType()),
    StructField("planned_at_s", DoubleType()),
]


def politeness_stream(
    requests: DataFrame,
    min_delay_s: float = MIN_DELAY_S,
    host_col: str = "host_hash",
    key_col: str = "url_hash",
    priority_col: str = "priority",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming politeness schedule over (host_hash, url_hash, priority).

    Returns (host_hash, url_hash, priority, seq_in_host, planned_at_s)
    where seq_in_host and planned_at_s continue across triggers via
    per-host state. Streaming-only (applyInPandasWithState requires a
    streaming query in this Spark); batch callers use
    operators/politeness.py, whose single-batch schedule this operator
    reproduces on a fresh state store (tested).
    """
    out_schema = StructType(OUT_FIELDS)
    delay = float(min_delay_s)

    def schedule(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        host = key[0]
        if state.exists:
            last_at, seq0 = state.get
        else:
            last_at, seq0 = -delay, 0
        # the state API hands the group's rows as an ITERATOR of pandas
        # chunks (Arrow batch segmentation) — a big host spans several.
        # The trigger-wide (priority, url_hash) ordering contract demands
        # ONE sort over the whole group, so concatenate first; per-chunk
        # sorting silently degrades to per-chunk ordering the moment a
        # group outgrows one Arrow batch (caught by the sf0.1 oracle
        # run, invisible at small scale). Group size is bounded by the
        # per-host trigger volume (BEAST-capped upstream), so the concat
        # is small by construction.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            order = (
                pdf[[priority_col, key_col]]
                .sort_values([priority_col, key_col], kind="mergesort")
                .index
            )
            pdf = pdf.loc[order]
            n = len(pdf)
            offsets = pd.RangeIndex(1, n + 1) * delay
            planned = last_at + offsets.to_numpy(dtype="float64")
            out = pd.DataFrame(
                {
                    "host_hash": host,
                    "url_hash": pdf[key_col].to_numpy(),
                    "priority": pdf[priority_col].to_numpy(dtype="float64"),
                    "seq_in_host": seq0 + pd.RangeIndex(1, n + 1),
                    "planned_at_s": planned,
                }
            )
            last_at = float(planned[-1])
            seq0 = int(seq0 + n)
            yield out
        state.update((last_at, seq0))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        requests.select(host_col, key_col, priority_col)
        .groupBy(host_col)
        .applyInPandasWithState(
            schedule, out_schema, STATE_SCHEMA, "append", timeout
        )
    )
