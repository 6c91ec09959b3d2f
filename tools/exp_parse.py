"""Parse-variant experiment for the CDC replay hot path.

Measures end-to-end cost of envelope-parse variants over the same 2M
event batch (local[16]), interleaved reps to ride out host noise.
Run: python tools/exp_parse.py [n_events] [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, types as T

from embulk_util_json_spark.sources.events import (
    BASE_DATA_FIELDS,
    EXTRAS_COL,
    parse_change_events_single_pass,
)
from embulk_util_json_spark.sources.generator import ensure_events_segments

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def v_current(events):
    return parse_change_events_single_pass(events)


def _project(parsed, ts_col):
    base = [n for n, _ in BASE_DATA_FIELDS]
    cols = [F.col("_e.op").alias("op"), ts_col, F.col("seq")]
    for name, dtype in BASE_DATA_FIELDS:
        cols.append(F.col("_e.data")[name].cast(dtype).alias(name))
    cols.append(
        F.map_filter(F.col("_e.data"), lambda k, _v: ~k.isin(*base)).alias(EXTRAS_COL)
    )
    return parsed.select(*cols)


def v_ts_inline(events):
    """ts parsed inside from_json (TimestampType + explicit format)."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    parsed = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.from_json(F.col("event_json"), schema, {"timestampFormat": TS_FMT}).alias("_e"),
    )
    return _project(parsed, F.col("_e.ts").alias("ts"))


def v_ts_explicit_fmt(events):
    """ts string + to_timestamp WITH explicit format."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    parsed = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.from_json(F.col("event_json"), schema).alias("_e"),
    )
    return _project(parsed, F.to_timestamp(F.col("_e.ts"), TS_FMT).alias("ts"))


def v_entries_filter(events):
    """map_filter replaced by filter over map_entries."""
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    parsed = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.from_json(F.col("event_json"), schema).alias("_e"),
    )
    base = [n for n, _ in BASE_DATA_FIELDS]
    cols = [
        F.col("_e.op").alias("op"),
        F.to_timestamp(F.col("_e.ts")).alias("ts"),
        F.col("seq"),
    ]
    for name, dtype in BASE_DATA_FIELDS:
        cols.append(F.col("_e.data")[name].cast(dtype).alias(name))
    cols.append(
        F.map_from_entries(
            F.filter(
                F.map_entries(F.col("_e.data")),
                lambda e: ~e["key"].isin(*base),
            )
        ).alias(EXTRAS_COL)
    )
    return parsed.select(*cols)


def v_struct_floor(events):
    """No-evolution struct parse (lower bound; loses extras)."""
    data_fields = [T.StructField(n, t) for n, t in BASE_DATA_FIELDS]
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("data", T.StructType(data_fields)),
        ]
    )
    parsed = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.from_json(F.col("event_json"), schema).alias("_e"),
    )
    cols = [
        F.col("_e.op").alias("op"),
        F.to_timestamp(F.col("_e.ts")).alias("ts"),
        F.col("seq"),
        *[F.col(f"_e.data.{n}").alias(n) for n, _ in BASE_DATA_FIELDS],
    ]
    return parsed.select(*cols)


def v_ts_inline_struct(events):
    """Floor + inline ts."""
    data_fields = [T.StructField(n, t) for n, t in BASE_DATA_FIELDS]
    schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("data", T.StructType(data_fields)),
        ]
    )
    parsed = events.select(
        F.col("seq").cast("long").alias("seq"),
        F.from_json(F.col("event_json"), schema, {"timestampFormat": TS_FMT}).alias("_e"),
    )
    cols = [
        F.col("_e.op").alias("op"),
        F.col("_e.ts").alias("ts"),
        F.col("seq"),
        *[F.col(f"_e.data.{n}").alias(n) for n, _ in BASE_DATA_FIELDS],
    ]
    return parsed.select(*cols)


def consume(df):
    """Force full materialization of every output column."""
    aggs = []
    for c, t in df.dtypes:
        if t.startswith("map<"):
            aggs.append(F.sum(F.size(F.col(c))))
            aggs.append(F.count(F.get(F.map_keys(F.col(c)), 0)))
        else:
            aggs.append(F.bit_xor(F.xxhash64(F.col(c))))
    return df.agg(*aggs).collect()[0]


def main():
    work = "/dev/shm/exp_parse"
    os.makedirs(work, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.local.dir", os.path.join(work, "spark-local"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    seg_dir = os.path.join(work, f"events-{N}")
    ensure_events_segments(seg_dir, N, segments=16, seed=42, evolve_after=0.75)
    events = spark.read.schema("seq long, event_json string").parquet(seg_dir)
    events = events.cache()
    events.count()

    variants = {
        "current(map+to_ts)": v_current,
        "ts_inline(map)": v_ts_inline,
        "ts_fmt(map)": v_ts_explicit_fmt,
        "entries_filter(map)": v_entries_filter,
        "struct_floor": v_struct_floor,
        "struct+ts_inline": v_ts_inline_struct,
    }
    # warm-up all
    for fn in variants.values():
        consume(fn(events).limit(50_000))

    times: dict[str, list[float]] = {k: [] for k in variants}
    ref = None
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.time()
            row = consume(fn(events))
            dt = time.time() - t0
            times[name].append(dt)
            # sanity: op/seq/conv hash equal across variants
            sig = (row[0], row[2])
            if ref is None:
                ref = sig
            elif sig != ref:
                print(f"  !! {name} signature differs: {sig} vs {ref}")
        print(f"rep {rep}: " + " ".join(f"{k}={times[k][-1]:.2f}" for k in variants))

    print("\nbest of reps:")
    for k, v in times.items():
        print(f"  {k:24s} {min(v):.3f}s  (all: {', '.join(f'{x:.2f}' for x in v)})")
    spark.stop()


if __name__ == "__main__":
    main()
