"""Partition-layout helpers.

``spread`` exists because parallelism is bounded by input splits: a parquet
file is split at row-group granularity, so a table written as few large row
groups scans as few tasks no matter how many cores exist (locally the driver's
``documents.parquet`` is ONE row group -> one task). CPU-bound per-row stages
(shingling, per-shingle hashing, vector math) then run effectively
single-threaded.

At 100 TB the input arrives as many thousands of splits and the conditional
below is a no-op — the repartition (a full shuffle of the payload) is applied
only when the scan's own parallelism is deficient, which is exactly the local
/ small-file case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Session conf switching every lineage-truncation site in this package
#: from executor-local ``localCheckpoint()`` to reliable, checkpoint-dir-
#: backed ``checkpoint()``. See :func:`truncate_lineage`.
RELIABLE_CHECKPOINT_CONF = "spark.datawrangle.reliableCheckpoint"


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and cut its lineage — the shared helper
    behind every iterative-plan / cache-lifecycle site in this package
    (BPE rounds, connected-components rounds, the prefix-Jaccard and
    near-dup result materializations).

    Default mode is ``localCheckpoint(eager=True)``: blocks live on
    executors, no external I/O — fast, and safe in local mode / bench
    runs and on clusters with STATIC executors. It is NOT fault-tolerant:
    lineage is gone, so on a cluster an executor loss (failure or
    dynamic-allocation decommission) makes the frame unrecomputable and
    later actions fail (ADVICE r8). For such clusters set

        spark.conf.set("spark.datawrangle.reliableCheckpoint", "true")
        spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")

    and every call site switches to reliable ``checkpoint(eager=True)``
    writing to the durable dir. The flag is read per call, so a session
    can flip modes between jobs. Raises up front if reliable mode is on
    without a checkpoint dir — the JVM error for that is late and cryptic.

    Both modes are EAGER by design: callers rely on the materialization
    barrier (bounded plan depth, cache-release correctness), and the
    cost is the same one pass a lazy first action would pay later.
    """
    spark = df.sparkSession
    if str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower() == "true":
        if spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{RELIABLE_CHECKPOINT_CONF}=true requires "
                "spark.sparkContext.setCheckpointDir(<durable shared path>)"
            )
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def overlap_jobs(thunks, max_workers: int = 4) -> list:
    """Run independent Spark-job thunks from a small thread pool (guide
    §2.6 overlap-independent-jobs): actions are only sequential because
    driver code calls them sequentially, so submitting independent writes
    together lets each job's tasks back-fill the executors freed by the
    others' stragglers. FIFO scheduling keeps the earlier job ahead; 2-4
    in flight is enough to fill tails without fighting for executors.

    Results return in submission order; the first thunk exception
    propagates after all submitted futures settle (same loud-failure
    surface as the sequential loop). ``SPARK_GRAFT_POOL=0`` serializes —
    the interleaved-A/B hatch (r18 measurement discipline)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    thunks = list(thunks)
    if len(thunks) <= 1 or os.environ.get("SPARK_GRAFT_POOL", "1") == "0":
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(thunks))) as pool:
        return [f.result() for f in [pool.submit(t) for t in thunks]]


def truncate_lineage_lazy(df: DataFrame) -> DataFrame:
    """LAZY twin of :func:`truncate_lineage`: marks the frame for
    checkpointing but lets the CALLER'S NEXT ACTION materialize it — that
    one job then does both the caller's aggregate AND the checkpoint
    write, where eager truncation costs a separate materialization job
    first (guide §1.2 "don't compute things twice"; the r19 BPE-trainer
    round fusion: per-round jobs 2 -> 1).

    ONLY safe when the caller immediately runs exactly ONE action that
    computes every partition of ``df`` (a global aggregate, a full
    collect): multiple concurrent consumers would race just like a lazy
    persist (see :func:`eager_cache`), and an action that skips
    partitions leaves the checkpoint to be completed by a fill-in job.
    Same reliable-checkpoint flag and checkpoint-dir guard as the eager
    form, so cluster semantics stay identical.
    """
    spark = df.sparkSession
    if str(spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false")).lower() == "true":
        if spark.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                f"{RELIABLE_CHECKPOINT_CONF}=true requires "
                "spark.sparkContext.setCheckpointDir(<durable shared path>)"
            )
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def eager_cache(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer intermediate ONCE, before its consumer
    stages can race on it (r18 optimization round).

    A lazily ``persist()``-ed frame is materialized by whichever consumer
    stage happens to run first — but AQE submits every independent query
    stage of one action CONCURRENTLY, so when N consumer stages need the
    same not-yet-populated cache they ALL miss and EACH recomputes the full
    defining subtree in parallel (r18 stage profile of dd_minhash_lsh at
    sf0.1: six concurrent 32-task stages each re-running the
    tokenize+shingle+md5 pipeline — sum of stage time 29.8s for a 7.9s
    wall; at 100 TB that is N concurrent corpus-scale scans of pure waste).

    Default implementation is :func:`truncate_lineage` (eager
    ``localCheckpoint``, or reliable ``checkpoint`` under the package's
    ``spark.datawrangle.reliableCheckpoint`` flag): one job computes the
    frame; consumers read materialized blocks AND their plans no longer
    contain the defining subtree, so AQE re-planning stops carrying it.
    Interleaved A/B at sf0.1 (12 reps/query, min): lazy persist vs
    persist+count vs eager checkpoint — dd_minhash_lsh 3.08/2.32/2.17,
    dd_groups_minhash 6.78/7.50/4.41 (iterative CC downstream re-plans the
    truncated plan every round — the checkpoint's biggest win),
    dd_incremental 3.09/3.54/3.43 (wash, within host noise).
    ``SPARK_GRAFT_CACHE_MODE`` in {ckpt, count, lazy} is the measurement
    escape hatch for re-running that A/B; production default is ckpt.

    Only worth it when the frame has MULTIPLE consumers under ONE action —
    a single consumer, or consumers separated by driver-side actions,
    cannot race.
    """
    import os

    mode = os.environ.get("SPARK_GRAFT_CACHE_MODE", "ckpt")
    if mode == "lazy":
        return df.persist()
    if mode == "count":
        df = df.persist()
        df.count()
        return df
    return truncate_lineage(df)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Two-path skew-resistant equi-join: salt ONLY the hot keys, take the
    plain join for everything else, union the results.

    The reference's user distribution is the motivating case — one user owns
    ~35% of all edits (reference readme.md:184-192); a plain shuffle join on
    such a key puts a third of the data in one task. AQE's skew-join split
    handles sort-merge joins after the fact; salting fixes the layout up
    front and also covers aggregations-after-join.

    Two-path shape (the earlier whole-side form salted EVERY left row and
    replicated the ENTIRE right side ``salt``x, wasting ``salt``x shuffle
    traffic on the cold majority and restricting use to broadcast-small
    right sides):

    1. one skinny aggregate finds left keys with >= ``hot_threshold`` rows
       — map-side partial agg, so the shuffle moves one row per key per
       input partition, never the payload. The hot set is at most
       |left| / hot_threshold keys, so broadcasting it is safe by
       construction.
    2. hot-key left rows get a uniform salt in [0, salt); right rows for
       hot keys are replicated ``salt``x; the salted equi-join spreads
       each hot key over ``salt`` tasks.
    3. cold keys (including null keys, which match nothing in the hot set)
       join completely untouched — no salt column, no replication.

    Only inner/left/left_semi/left_anti types are accepted: under right or
    full outer joins every unmatched right row would survive once per salt
    replica (``salt``x duplicates).

    Cost shape: the left side is read three times (the skinny hot-key
    aggregate plus the two filtered branches) and the right twice. This is
    deliberate: the extra reads are column-pruned parquet SCANS (cheap,
    pushdown-friendly), traded against the old form's ``salt``x shuffle
    WRITE of the whole right side — and persisting the flagged left frame
    to avoid the re-read would pin the full fact table in executor memory,
    the one thing a skew-handling helper must never do.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join does not support how={how!r} (right/full outer would duplicate unmatched right rows)")
    from pyspark.sql import functions as F

    hot = (
        left.groupBy(*on)
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= hot_threshold)
        .select(*on)
        .withColumn("__hot", F.lit(1))
    )
    lf = left.join(F.broadcast(hot), on, "left")
    l_hot = (
        lf.where(F.col("__hot") == 1)
        .drop("__hot")
        .withColumn("__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt)))
    )
    l_cold = lf.where(F.col("__hot").isNull()).drop("__hot")
    rf = right.join(F.broadcast(hot), on, "left")
    r_hot = (
        rf.where(F.col("__hot") == 1)
        .drop("__hot")
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    )
    r_cold = rf.where(F.col("__hot").isNull()).drop("__hot")
    hot_joined = l_hot.join(r_hot, [*on, "__salt"], how).drop("__salt")
    return hot_joined.unionByName(l_cold.join(r_cold, on, how))


def explode_nonempty(df: DataFrame, keep: list, arr: str, alias: str) -> DataFrame:
    """``explode`` of a NAMED computed array column, without the
    InferFiltersFromGenerate trap.

    ``F.explode(attr)`` makes the optimizer infer ``size(attr) > 0 AND
    isnotnull(attr)`` and push that filter below projections, exchanges,
    and unions — substituting the attribute's full defining expression into
    the filter. For a CPU-heavy array builder (shingling, minhash band
    keys) that re-evaluates the whole subtree once per input row, AND runs
    it below any ``spread`` repartition, i.e. at the scan's own (possibly
    single-task) parallelism. Measured 8x slower on the sf0.1 shingle
    pipeline. ``explode_outer`` infers no such filter; dropping the null
    rows afterwards is equivalent to inner explode for arrays with no null
    ELEMENTS (ours: concat_ws/hash outputs are never null).

    ``keep``: columns (names or Columns) carried alongside the exploded
    ``alias``.
    """
    from pyspark.sql import functions as F

    return df.select(*keep, F.explode_outer(arr).alias(alias)).where(
        F.col(alias).isNotNull()
    )


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``min_partitions`` (default: the cluster's
    defaultParallelism) ahead of a CPU-bound per-row stage.

    Unconditional by design: checking the scan's actual parallelism
    (``df.rdd.getNumPartitions()``) costs a full extra physical-plan compile
    per query (~1s of driver time), while the exchange itself moves each row
    once and is dwarfed by the downstream per-row work this helper guards
    (per-shingle hashing, vector math). Only use ``spread`` where that
    trade holds; plain scans/aggregations should rely on input splits.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(min_partitions or sc.defaultParallelism)
