"""Distributed exact global ranks — no single-partition WindowExec.

A bare ``Window.orderBy(...)`` (no PARTITION BY) makes Spark move every
row to ONE task (WindowExec warns "No Partition Defined"); fine on 60 k
rows, fatal at 100 TB. These builders produce the *same exact results*
with bounded per-task memory:

1. ``repartitionByRange`` on the sort key → each task holds one
   contiguous key range (Spark's range partitioner samples
   deterministically, and ties can split across partitions safely
   because the full sort key is required to be unique);
2. local ``row_number`` within each range partition;
3. add the partition's global offset (a ≤ #partitions-row aggregate,
   broadcast back).

Cost: two exchanges of the data (range + the pid-hash the window
needs) instead of one single-task sort — the classic distributed
total-order trade. ``exact_ntile`` reproduces ANSI NTILE's bucket
sizing (first n%k buckets get ⌈n/k⌉ rows) from the global rank, so
results hash-match the naive form bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PID = "__rank_pid"
_OFF = "__rank_off"
_CNT = "__rank_cnt"
UNIT_GROUP = "__rank_g"


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def attach_unit_group(df: DataFrame, name: str = UNIT_GROUP) -> DataFrame:
    """Attach a constant-zero group column Catalyst cannot fold away
    (it is read from a 1-row relation, not a literal), so a global
    window can declare ``partitionBy(name)`` and keep WindowExec's
    partition spec non-empty.

    Use ONLY on manifest-/calendar-sized frames where a single task is
    the intended plan: the column states that intent in the plan
    instead of tripping the data-scale "No Partition Defined" warning.
    A plain ``partitionBy(F.lit(0))`` does NOT work — FoldablePropagation
    strips literal partition keys and the warning fires anyway.
    """
    one = df.sparkSession.range(1).select(F.col("id").cast("int").alias(name))
    return df.crossJoin(F.broadcast(one))


def global_row_number(
    df: DataFrame, order_cols, out: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Exact 1-based global row_number over a total order, distributed.

    ``order_cols`` MUST form a total order (end with a unique key) —
    the same contract the graded queries already obey (SURVEY §8.4).
    """
    cols = _cols(order_cols)
    parts = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # Materialize ONCE: both the offset branch and the data branch read
    # this frame, and each must see the identical partitioning. Without
    # the checkpoint they are two executions of a sampled range
    # exchange, and AQE/exchange-reuse can give them different physical
    # partitionings — observed at sf0.1 as pid↔offset mismatch
    # (duplicate global ranks, NTILE buckets collapsing 10 → 5).
    withpid = parts.withColumn(_PID, F.spark_partition_id()).localCheckpoint()
    counts = withpid.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    counts = attach_unit_group(counts)
    # ≤ #partitions rows: the single-partition window here is over the
    # partition *manifest*, not the data.
    w_off = (
        Window.partitionBy(UNIT_GROUP)  # manifest-sized: one group by design
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
    return (
        withpid.join(F.broadcast(offs), _PID)
        .withColumn(out, (F.col(_OFF) + local).cast("long"))
        .drop(_PID, _OFF)
    )


def global_rank_and_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    rank_out: str = "rn",
    cum_out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row_number AND running sum over one total order in a
    single range exchange — the fused form Zipf/coverage curves need
    (rank tokens by count desc, cumulate the same count).

    One ``repartitionByRange`` on the sort key, then per-partition
    count and value-sum aggregated together; both offsets broadcast
    back and added to the local window results. ``order_cols`` must
    form a total order (SURVEY §8.4).
    """
    cols = _cols(order_cols)
    parts = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # Materialized once for the same pid-consistency reason as
    # global_row_number above.
    withpid = parts.withColumn(_PID, F.spark_partition_id()).localCheckpoint()
    stats = withpid.groupBy(_PID).agg(
        F.count(F.lit(1)).alias(_CNT), F.sum(value_col).alias("__rank_vsum")
    )
    stats = attach_unit_group(stats)
    # ≤ #partitions rows — manifest-sized, not data-sized.
    w_off = (
        Window.partitionBy(UNIT_GROUP)  # manifest-sized: one group by design
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = stats.select(
        _PID,
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
        F.coalesce(F.sum("__rank_vsum").over(w_off), F.lit(0)).alias("__rank_voff"),
    )
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    local_rn = F.row_number().over(w_local)
    local_cum = F.sum(value_col).over(
        w_local.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        withpid.join(F.broadcast(offs), _PID)
        .withColumn(rank_out, (F.col(_OFF) + local_rn).cast("long"))
        .withColumn(cum_out, F.col("__rank_voff") + local_cum)
        .drop(_PID, _OFF, "__rank_voff")
    )


def exact_ntile(
    df: DataFrame, k: int, order_cols, out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """ANSI NTILE(k) over a total order without a single-task sort.

    Derives the bucket from the distributed global rank: with n rows,
    q = n÷k and r = n mod k, the first r buckets take q+1 rows —
    identical to the engine NTILE the oracles run.
    """
    rn = "__rank_rn"
    ranked = global_row_number(df, order_cols, out=rn, num_partitions=num_partitions)
    n_df = ranked.agg(F.count(F.lit(1)).alias("__rank_n"))
    q = F.expr(f"__rank_n DIV {k}")
    r = F.expr(f"__rank_n % {k}")
    rnc = F.col(rn)
    bucket = (
        F.when(rnc <= (q + 1) * r, F.expr(f"({rn} - 1) DIV (__rank_n DIV {k} + 1)"))
        .otherwise(
            r + F.expr(
                f"({rn} - 1 - (__rank_n DIV {k} + 1) * (__rank_n % {k}))"
                f" DIV (__rank_n DIV {k})"
            )
        )
        + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n_df))
        .withColumn(out, bucket.cast("long"))
        .drop(rn, "__rank_n")
    )


def grouped_prefix_max(
    df: DataFrame,
    group_cols,
    order_cols,
    value_col: str,
    out: str = "runmax",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group EXCLUSIVE running max over a total order, distributed —
    the prefix-max behind skyline / Pareto-frontier queries, without a
    single-task-per-group WindowExec.

    Same architecture as :func:`global_row_number`, generalized to a
    grouped prefix aggregate: range-repartition on (group, order) so
    each task holds a contiguous slice of one-or-more groups, take the
    per-(group, partition) max, prefix-max those offsets per group over
    the partition *manifest* (tiny), then combine the broadcast offset
    with a local exclusive window max. ``out`` is NULL for the first
    row of each group (no preceding rows) — matches ANSI
    ``MAX(v) OVER (PARTITION BY g ORDER BY o ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` exactly. ``group_cols + order_cols``
    must form a total order (SURVEY §8.4).
    """
    gcols = _cols(group_cols)
    ocols = _cols(order_cols)
    gnames = [c if isinstance(c, str) else None for c in group_cols]
    if any(n is None for n in gnames):
        raise ValueError("group_cols must be plain column names")
    parts = (
        df.repartitionByRange(num_partitions, *gcols, *ocols)
        if num_partitions
        else df.repartitionByRange(*gcols, *ocols)
    )
    # Materialized once for the same pid-consistency reason as
    # global_row_number above.
    withpid = parts.withColumn(_PID, F.spark_partition_id()).localCheckpoint()
    gmax = withpid.groupBy(_PID, *gnames).agg(F.max(value_col).alias(_CNT))
    # ≤ #partitions × #groups-per-partition rows: the window below runs
    # on the partition manifest, not the data.
    w_off = (
        Window.partitionBy(*gnames)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = gmax.select(_PID, *gnames, F.max(_CNT).over(w_off).alias(_OFF))
    local = F.max(value_col).over(
        Window.partitionBy(_PID, *gnames)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        withpid.join(F.broadcast(offs), [_PID, *gnames])
        .withColumn(out, F.greatest(F.col(_OFF), local))
        .drop(_PID, _OFF)
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols,
    order_cols,
    value_col: str,
    out: str = "runsum",
    inclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum over a total order, distributed — the
    byte-offset primitive behind shard indexes (WebDataset-style tar
    manifests) and grouped Lorenz curves. ``inclusive=False`` (the
    default) gives the EXCLUSIVE prefix — each row's offset is the sum
    of all earlier rows, 0 for the group's first row — i.e. exactly a
    start offset. Same architecture as :func:`grouped_prefix_max`;
    exact for integer/decimal ``value_col``; ``group_cols +
    order_cols`` must form a total order (SURVEY §8.4).
    """
    gcols = _cols(group_cols)
    ocols = _cols(order_cols)
    gnames = [c if isinstance(c, str) else None for c in group_cols]
    if any(n is None for n in gnames):
        raise ValueError("group_cols must be plain column names")
    parts = (
        df.repartitionByRange(num_partitions, *gcols, *ocols)
        if num_partitions
        else df.repartitionByRange(*gcols, *ocols)
    )
    # Materialized once for the same pid-consistency reason as
    # global_row_number above.
    withpid = parts.withColumn(_PID, F.spark_partition_id()).localCheckpoint()
    gsum = withpid.groupBy(_PID, *gnames).agg(F.sum(value_col).alias(_CNT))
    # manifest-sized window: ≤ #partitions × #groups-per-partition rows
    w_off = (
        Window.partitionBy(*gnames)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = gsum.select(_PID, *gnames, F.sum(_CNT).over(w_off).alias(_OFF))
    hi = 0 if inclusive else -1
    local = F.sum(value_col).over(
        Window.partitionBy(_PID, *gnames)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    zero = F.lit(0).cast("long")
    return (
        withpid.join(F.broadcast(offs), [_PID, *gnames])
        .withColumn(
            out, F.coalesce(F.col(_OFF), zero) + F.coalesce(local, zero)
        )
        .drop(_PID, _OFF)
    )


def global_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running sum over a total order, distributed — the prefix
    sum behind Pareto/Lorenz curves and cumulative-share reports.

    Same architecture as :func:`global_row_number`: range-repartition
    on the sort key, local window cumsum per range partition, add the
    broadcast sum of all earlier partitions. Exact for integer/decimal
    ``value_col`` (use cents for money); ``order_cols`` must form a
    total order.
    """
    cols = _cols(order_cols)
    parts = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # Materialized once for the same pid-consistency reason as
    # global_row_number above.
    withpid = parts.withColumn(_PID, F.spark_partition_id()).localCheckpoint()
    sums = withpid.groupBy(_PID).agg(F.sum(value_col).alias(_CNT))
    sums = attach_unit_group(sums)
    w_off = (
        Window.partitionBy(UNIT_GROUP)  # manifest-sized: one group by design
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sums.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    local = F.sum(value_col).over(
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        withpid.join(F.broadcast(offs), _PID)
        .withColumn(out, F.col(_OFF) + local)
        .drop(_PID, _OFF)
    )
