"""Z-order layout: both dimensions must prune files, unlike a lexicographic
sort where the trailing dimension reads every file."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.storage.zorder import (
    file_overlap_fraction,
    write_zordered,
    z_interleave,
)

N_FILES = 16


def _grid(spark):
    # 64x64 (sym, hour) grid, one row per cell — uniform in both dimensions
    return spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("sym"),
        (F.col("id") / 64).cast("int").alias("hour"),
    )


def test_z_interleave_known_values(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int"
    ).select(z_interleave(F.col("a"), F.col("b"), bits=4).alias("z"))
    # (3,5) -> a bits 11 at even slots, b bits 101 at odd: z = 100111b = 39
    assert [r.z for r in rows.collect()] == [0, 1, 2, 39]


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "zorder")
    lexpath = str(tmp_path / "lex")
    write_zordered(df, zpath, F.col("sym"), F.col("hour"), n_files=N_FILES, bits=6)
    # baseline: lexicographic (sym, hour) layout, same file count
    (
        df.repartitionByRange(N_FILES, "sym", "hour")
        .sortWithinPartitions("sym", "hour")
        .write.mode("overwrite")
        .parquet(lexpath)
    )

    # narrow slice in each single dimension (8/64 of the domain)
    sym_z = file_overlap_fraction(zpath, "sym", 8, 15)
    hour_z = file_overlap_fraction(zpath, "hour", 8, 15)
    sym_lex = file_overlap_fraction(lexpath, "sym", 8, 15)
    hour_lex = file_overlap_fraction(lexpath, "hour", 8, 15)

    # lexicographic: leading dim prunes hard, trailing dim reads EVERYTHING
    assert sym_lex <= 0.25
    assert hour_lex == 1.0
    # z-order: BOTH single-dimension slices skip at least half the files
    assert sym_z <= 0.5 and hour_z <= 0.5

    # layout must not change query results
    assert (
        spark.read.parquet(zpath).filter("hour between 8 and 15").count()
        == spark.read.parquet(lexpath).filter("hour between 8 and 15").count()
        == 8 * 64
    )


def test_compact_zorder_tiles_time_dimension(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.storage.table import ServingTable
    from binance_etl_clickhouse_spark.storage.zorder import file_overlap_fraction

    # 8 symbols x 512 hours in one month
    df = spark.range(8 * 512).select(
        F.concat(F.lit("SYM"), (F.col("id") % 8)).alias("symbol"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=(F.col("id") / 8).cast("int") % 512)
        ).alias("timestamp"),
        (F.col("id") * 1.0).alias("value"),
    )
    t = ServingTable(
        path=str(tmp_path / "k"),
        keys=["symbol", "timestamp"],
        time_col="timestamp",
        sort_cols=["symbol", "timestamp"],
    )
    t.append(df, ingest_seq=1)
    before = sorted(t.read(spark).collect())

    # at test volume AQE would coalesce the range shuffle to one file,
    # hiding the tiling this test observes (at real scale ~64 MB tiles are
    # exactly what AQE should produce)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        t.compact(spark, zorder=("symbol", "timestamp"))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.unset("spark.sql.shuffle.partitions")
    after = sorted(t.read(spark).collect())
    assert before == after  # layout change must not change the data

    month_dir = glob.glob(str(tmp_path / "k" / "month=*"))[0]
    n_files = len(glob.glob(month_dir + "/*.parquet"))
    assert n_files >= 4
    # a 1/8 time slice must NOT touch every file (symbol-sorted layout would)
    import datetime

    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 3, 16)  # 64 of 512 hours
    frac = file_overlap_fraction(month_dir, "timestamp", lo, hi)
    assert frac < 0.8, f"time slice touched {frac:.0%} of z-ordered files"
