"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the **union-sort trick**, not a UDF: tag right rows 0
and left rows 1, union on (key, time, tag), and carry the right
payload forward with ``last(..., ignorenulls=True)`` over an ordered
window. One shuffle on the key, one in-partition sort — the same cost
shape as a sort-merge join, and fully Catalyst-visible (no
``applyInPandas`` / ``merge_asof`` Python detour).

Semantics: for each left row, the right row with the greatest
``time <= left.time`` on the same key (inclusive; right-before-left at
equal timestamps). Matches DuckDB's ``ASOF JOIN`` with ``>=``, which
the oracle uses.

At 100 TB: the window is per-key and streaming-friendly (rows only
carry forward), no broadcast, no quadratic term; skewed keys fall to
AQE. For an append-only right side this is also exactly the state
layout ``applyInPandasWithState`` would keep in streaming mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: latest right payload at or before each left
    row's time, per key. ``how='left'`` keeps unmatched left rows."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    w = Window.partitionBy("_k").orderBy("_t", "_is_left").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = l_tag.unionByName(r_tag).select(
        "_k",
        "_t",
        "_is_left",
        "_lrow",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_p_{c}")
            for c in payload_cols
        ],
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_p_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{payload_cols[0]}").isNotNull())
    return out


def interval_join_days(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_date: str,
    window_days: int,
    how: str = "inner",
) -> DataFrame:
    """Bucketized interval (range) join — the second temporal join
    Spark lacks natively: match each left row to every right row whose
    day window ``[right_date, right_date + window_days)`` contains
    ``left_time``. Both inputs must already share ``key``.

    A naive range join is an equi-join on ``key`` followed by a
    per-key cross filter — quadratic in the hot key's row count and
    not an equi-join Catalyst can shuffle-partition on the time axis.
    Instead the RIGHT side replicates into its ``window_days`` day
    buckets (bounded ×``window_days`` fan-out, declared up front) and
    the join becomes a plain equi-join on ``(key, day)``:

    * shuffle volume is ``|right| × window_days + |left|`` — linear,
      never quadratic, independent of key skew on the time axis;
    * day-granular windows make the bucket match EXACT (``date(t) ∈
      [d, d+w-1] ⟺ t ∈ [d 00:00, d+w 00:00)``) — no residual filter,
      so no post-join row explosion to re-check;
    * sub-day bounds would add one residual range predicate after the
      same bucket join (the standard banded range-join shape) — the
      plan and its scale behavior are unchanged.

    At 100 TB: both sides hash-partition on ``(key, day)``, so a
    single hot user spreads over ``window_days`` partitions rather
    than one; AQE skew-join splits any residual hot bucket.
    """
    b_right = right.withColumn(
        "_day",
        F.explode(
            F.sequence(
                F.col(right_date).cast("date"),
                F.date_add(F.col(right_date).cast("date"), window_days - 1),
            )
        ),
    )
    b_left = left.withColumn("_day", F.to_date(F.col(left_time)))
    return b_left.join(b_right, on=[key, "_day"], how=how).drop("_day")


def interval_join_timestamps(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_start: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
    how: str = "inner",
    bounds: str = "[)",
) -> DataFrame:
    """Banded range join with sub-day (timestamp) bounds: match left
    rows where ``right_start <= left_time < right_start +
    window_seconds`` — the residual-filter generalization
    :func:`interval_join_days` documents. ``bounds`` flips the
    inclusivity: ``"[)"`` (default) is the half-open interval above;
    ``"(]"`` matches ``right_start < left_time <= right_start +
    window_seconds`` — the shape of a *preceding*-window predicate
    like click attribution (click strictly before the purchase,
    purchase at most ``window`` after the click). Only the residual
    predicate and the replica count change; the bucket equi-join —
    and therefore the plan's scale behavior — is identical.

    The right side replicates into every fixed-width time bucket its
    window can touch, both sides equi-join on ``(key, bucket)``, and
    ONE residual range predicate restores exactness. A window of ``w``
    integer seconds starting at offset ``r mod b`` inside a ``b``-wide
    bucket spans ``floor((r mod b + w - 1) / b) + 1`` buckets; the
    worst case over all offsets is ``floor((w + b - 2) / b) + 1`` —
    note this is ≥ 2 whenever ``w ≥ 2``, even for ``b > w`` (a short
    window can still straddle one bucket boundary; the previous
    ``w // b + 1`` formula collapsed to 1 replica there and silently
    dropped boundary-crossing matches — ADVICE r5). Bucket width
    defaults to the window width, making the fan-out exactly 2×. Same
    scale shape as the day variant: linear shuffle, hot keys spread
    over adjacent buckets, AQE handles the rest.
    """
    bucket = int(bucket_seconds or window_seconds)
    if bucket <= 0 or window_seconds <= 0:
        raise ValueError("window_seconds and bucket_seconds must be positive")
    if bounds not in ("[)", "(]"):
        raise ValueError(f"bounds must be '[)' or '(]', got {bounds!r}")
    # worst-case covered buckets per right row (see docstring
    # derivation). The "(]" span reaches one second further right
    # (r + w inclusive), so its worst case over offsets is
    # floor((b - 1 + w) / b) + 1 — one more replica only when w is an
    # exact multiple of the bucket width.
    if bounds == "[)":
        n_buckets = (window_seconds + bucket - 2) // bucket + 1
    else:
        n_buckets = (window_seconds + bucket - 1) // bucket + 1
    r_epoch = F.unix_timestamp(F.col(right_start).cast("timestamp"))
    b_right = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(r_epoch / bucket),
                F.floor(r_epoch / bucket) + F.lit(n_buckets - 1),
            )
        ),
    )
    l_epoch = F.unix_timestamp(F.col(left_time).cast("timestamp"))
    b_left = left.withColumn("_bkt", F.floor(l_epoch / bucket))
    l_ts = F.col(left_time).cast("timestamp")
    r_ts = F.col(right_start).cast("timestamp")
    upper = F.unix_timestamp(r_ts) + F.lit(window_seconds)
    if bounds == "[)":
        residual = (l_ts >= r_ts) & (F.unix_timestamp(l_ts) < upper)
    else:
        residual = (l_ts > r_ts) & (F.unix_timestamp(l_ts) <= upper)
    if how != "inner":
        # a left-outer here would emit one null row per PROBED bucket
        # for a true non-match; collapsing those is caller-specific —
        # run inner and re-attach unmatched left rows via left_anti
        raise ValueError(
            f"unsupported how={how!r}: only 'inner' (re-attach unmatched "
            "left rows with a left_anti join if needed)"
        )
    return (
        b_left.join(b_right, on=[key, "_bkt"], how="inner")
        .filter(residual)
        .drop("_bkt")
    )
