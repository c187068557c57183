"""Streaming queries in the registry.

``st_hourly_rollup`` carries the SAME oracle SQL as its batch twin
``t_hourly_rollup``: over a finite input, the windowed streaming aggregation
must equal the batch groupBy exactly — so even the streaming path is fully
value-checked by DuckDB.

``st_sessionize`` emits only *closed* sessions. In general which sessions
have closed depends on stream progress, but over the driver's actual input —
one parquet file consumed by an AvailableNow trigger with no
maxFilesPerTrigger, i.e. a SINGLE micro-batch — the closed set is fully
deterministic: every session except each user's last (the tail session stays
open in state when the input ends). The oracle encodes exactly that:
batch sessionization minus the per-user max session_id. Batch-split
robustness (multi-batch, late events) is additionally asserted in
tests/test_streaming.py by diffing against the batch sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.dedup import run_dedup_once
from ..streaming.join import run_stream_join_once
from ..streaming.rollup import run_hourly_rollup_once
from ..streaming.sessions import run_sessionize_once
from ..streaming.topk import run_topk_once
from .registry import register


@register(
    "st_hourly_rollup",
    """
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
           count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window rollup (AvailableNow over the "
    "events file source); must equal the batch twin, and the oracle checks "
    "that it does",
)
def st_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return run_hourly_rollup_once(spark, sf)


@register(
    "st_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="streaming dedup via dropDuplicatesWithinWatermark (bounded state: "
    "keys expire past the watermark); over a finite input the surviving key "
    "set equals batch DISTINCT, which the oracle checks",
)
def st_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return run_dedup_once(spark, sf, ["user_id", "event_type"])


@register(
    "st_stream_join",
    """
    WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id, ts AS view_ts, value AS view_value
          FROM events WHERE event_type = 'view')
    SELECT click_id, c.user_id,
           CAST(click_ts AS VARCHAR) AS click_ts,
           CAST(view_ts AS VARCHAR) AS view_ts,
           round(view_value, 2) AS view_value
    FROM c JOIN v ON c.user_id = v.user_id
                 AND view_ts >= click_ts - INTERVAL 600 SECONDS
                 AND view_ts <= click_ts
    """,
    doc="watermarked stream-stream join (clicks x views within a trailing "
    "10-min window; the time bound is what lets join state expire); over a "
    "finite input it equals the batch join, which the oracle checks",
)
def st_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    return run_stream_join_once(spark, sf, window_minutes=10.0)


@register(
    "st_topk",
    """
    WITH c AS (SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
                      event_type, count(*) AS cnt
               FROM events GROUP BY 1, 2),
    r AS (SELECT hour, event_type, cnt,
                 row_number() OVER (PARTITION BY hour
                                    ORDER BY cnt DESC, event_type ASC) AS rk
          FROM c)
    SELECT hour, event_type, cnt, rk FROM r WHERE rk <= 3
    """,
    doc="streaming windowed heavy hitters: watermarked per-hour counts in "
    "the stream (rank is not streaming-legal — a row's rank isn't final "
    "until its window closes), top-3 ranked per closed window at the sink "
    "(foreachBatch in production, snapshot here); equals the batch "
    "count+rank twin over a finite input, which the oracle checks",
)
def st_topk(spark: SparkSession, sf: str) -> DataFrame:
    return run_topk_once(spark, sf, k=3)


@register(
    "st_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    ),
    agg AS (
      SELECT user_id, session_id,
             CAST(min(ts) AS VARCHAR) AS session_start,
             CAST(max(ts) AS VARCHAR) AS session_end,
             count(*) AS n_events,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS duration_ms
      FROM sess GROUP BY user_id, session_id
    ),
    last AS (SELECT user_id, max(session_id) AS last_sid FROM agg GROUP BY user_id)
    SELECT a.user_id, session_start, session_end, n_events, duration_ms
    FROM agg a JOIN last l ON a.user_id = l.user_id AND a.session_id < l.last_sid
    """,
    doc="stateful streaming gap-sessionization via applyInPandasWithState; "
    "emits closed sessions only. Over the single-file AvailableNow input the "
    "closed set is deterministic (all sessions but each user's open tail), "
    "so the oracle is the batch sessionizer minus the per-user last session; "
    "batch-split robustness additionally asserted in tests",
)
def st_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    return run_sessionize_once(spark, sf, gap_minutes=30.0)


def _st_hll_oracle() -> str:
    from ..operators.sketches import HLL_ALPHA, HLL_M, HLL_P, HLL_RHO_BITS

    mask = (1 << HLL_RHO_BITS) - 1
    alpha_m2 = HLL_ALPHA * HLL_M * HLL_M
    return f"""
    WITH it AS (SELECT user_id::VARCHAR || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS item
                FROM events),
    h AS (SELECT ('0x' || substr(md5(item || ':hll'), 1, 15))::BIGINT AS h FROM it),
    br AS (SELECT h % {HLL_M} AS bucket, (h >> {HLL_P}) & {mask} AS rem FROM h),
    r AS (SELECT bucket,
                 max(CASE WHEN rem = 0 THEN {HLL_RHO_BITS + 1}
                          ELSE length(bin(rem & -rem)) END) AS rho
          FROM br GROUP BY bucket),
    s AS (SELECT count(*) AS nb,
                 sum(CAST(1 AS DOUBLE) / (1::BIGINT << rho)) AS s_ne FROM r)
    SELECT CAST(floor(CAST('{alpha_m2!r}' AS DOUBLE)
                      / (CAST({HLL_M} - nb AS DOUBLE) + s_ne)) AS BIGINT)
             AS est_distinct,
           nb AS nonempty_buckets FROM s
    """


@register(
    "st_hll",
    _st_hll_oracle(),
    doc="STREAMING distinct count via HyperLogLog: groupBy(bucket).max(rho) "
    "is the HLL merge, so the streaming aggregation state is bounded at "
    "m=256 rows no matter how many distinct items pass — the inverse of "
    "dropDuplicates' one-state-row-per-key, and no watermark needed (a "
    "max-monoid never expires). Estimate computed sink-side from the "
    "final sketch snapshot; over a finite input it equals the batch "
    "sketch, which the oracle value-checks",
)
def st_hll(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.sketch import run_hll_once

    return run_hll_once(spark, sf)


@register(
    "st_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id,
           event_type AS last_event_type,
           round(value, 2) AS last_value,
           CAST(ts AS VARCHAR) AS last_ts
    FROM ranked
    WHERE rk = 1 AND event_type <> 'error'
    """,
    doc="streaming CDC apply: the events changelog merged into a keyed "
    "snapshot (events upsert per user_id; 'error' is the tombstone). Each "
    "micro-batch compacts to its latest change per key then MERGEs via one "
    "full-outer join against the copy-on-write parquet snapshot, resolving "
    "by change order (ts, event_id) so out-of-order batches can't regress "
    "a key and late updates can't resurrect a tombstone. Final snapshot "
    "equals the batch window-argmax with tombstoned keys removed, which "
    "the oracle checks; multi-batch/out-of-order replay is pinned in "
    "tests/test_streaming_cdc.py",
)
def st_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.cdc import run_cdc_apply_once

    return run_cdc_apply_once(spark, sf)


@register(
    "st_cdc_manifest",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id,
           event_type AS last_event_type,
           round(value, 2) AS last_value,
           CAST(ts AS VARCHAR) AS last_ts
    FROM ranked
    WHERE rk = 1 AND event_type <> 'error'
    """,
    doc="CDC apply with a per-version bucket MANIFEST (round 9): the "
    "copy-on-write step rewrites ONLY buckets containing batch keys "
    "(driver-side bucket->files dict standing in for a table format's "
    "commit log), closing the O(snapshot) per-trigger write term of "
    "st_cdc_apply; same (ts, event_id) change-order merge and tombstone "
    "retention, same oracle (full-log window-argmax minus tombstones) - "
    "a green row proves the file-pruned path loses no key; bytes/files "
    "rewritten per trigger measured in CDCMANIFEST_WIN.json",
)
def st_cdc_manifest(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.cdc import run_cdc_apply_manifest

    return run_cdc_apply_manifest(spark, sf)


@register(
    "st_transition_matrix",
    """
    SELECT coalesce(prev_type, 'START') AS prev_type, event_type AS next_type,
           count(*) AS n
    FROM (SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
    GROUP BY 1, 2
    """,
    doc="STREAMING journey transition matrix (applyInPandasWithState, "
    "streaming/transitions.py) — the stateful twin of a_transition_matrix: "
    "per-user frontier event in the state store (O(users) state), each "
    "micro-batch emits pre-aggregated pair counts chained from the "
    "frontier with a START state for first-ever events; final rollup sums "
    "the per-batch rows. Over the single-file AvailableNow input the "
    "stream equals the batch matrix exactly (the shared oracle); "
    "time-split multi-batch equivalence and the out-of-order frontier "
    "approximation are pinned in tests/test_round10_ops.py",
)
def st_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.transitions import run_transitions_once

    return run_transitions_once(spark, sf)
