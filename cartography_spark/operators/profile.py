"""Single-pass table profiling: per-column row/null/distinct counts
and typed min/max — the ANALYZE-style stats pass a pipeline runs after
every materialization (schema drift, null explosions, and cardinality
collapse are the three silent corpus-killers, and all three show up
here before any downstream job wastes a cluster-day).

The reference's analog is its per-sync stats module
(``cartography/stats.py`` counters attached to each sync phase); this
is the table-shaped form over any DataFrame.

Scale shape: ONE aggregation pass over the data computes every
column's stats together (the per-column expressions all ride the same
scan; exact ``countDistinct`` per column costs one Expand — the
documented exactness trade; at 100 TB swap it for
``sketches.hll_distinct`` per column and keep the same output shape).
The only collect is the 1-row aggregate, reshaped driver-side into the
per-column frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F, types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("col_name", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_nulls", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), True),
        T.StructField("min_num", T.DoubleType(), True),
        T.StructField("max_num", T.DoubleType(), True),
        T.StructField("min_str", T.StringType(), True),
        T.StructField("max_str", T.StringType(), True),
    ]
)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column: ``(col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)``. Numeric min/max
    land in ``min_num``/``max_num`` (double — exact for the values
    picked), timestamps as epoch MICROSECONDS in the numeric slots
    (render-format-proof across engines), strings in the ``_str``
    slots; other types (binary/array/map) get counts only, with
    ``n_distinct`` NULL when the type is not comparable that way."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    for c in cols:
        if c not in fields:
            raise ValueError(f"no such column: {c!r}")

    exprs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        simple = isinstance(dt, _NUMERIC + (T.StringType, T.TimestampType,
                                            T.TimestampNTZType, T.DateType,
                                            T.BooleanType))
        if simple:
            exprs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        if isinstance(dt, _NUMERIC):
            exprs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            exprs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ casts through TIMESTAMP under the session's pinned-UTC
            # contract, so epoch micros agree with DuckDB's epoch_us on
            # the same naive value.
            exprs.append(
                F.unix_micros(F.min(c).cast("timestamp"))
                .cast("double").alias(f"__min_{c}")
            )
            exprs.append(
                F.unix_micros(F.max(c).cast("timestamp"))
                .cast("double").alias(f"__max_{c}")
            )
        elif isinstance(dt, T.StringType):
            exprs.append(F.min(c).alias(f"__smin_{c}"))
            exprs.append(F.max(c).alias(f"__smax_{c}"))
    row = df.agg(*exprs).collect()[0].asDict()

    out = []
    for c in cols:
        out.append(
            Row(
                col_name=c,
                n_rows=int(row["__n"]),
                n_nulls=int(row[f"__nulls_{c}"]),
                n_distinct=(
                    int(row[f"__dist_{c}"]) if f"__dist_{c}" in row else None
                ),
                min_num=row.get(f"__min_{c}"),
                max_num=row.get(f"__max_{c}"),
                min_str=row.get(f"__smin_{c}"),
                max_str=row.get(f"__smax_{c}"),
            )
        )
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)
