"""Scale-layout operators: bucketed joins must eliminate exchanges;
salted join / two-phase agg must be result-identical to their naive
forms on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.functions.exact import DEC
from pyspark_airflow_weather_etl_spark.operators.scale import (
    bucketed_tables_join,
    salted_join,
    two_phase_agg,
    write_bucketed,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the AQE-resistant shape."""
    hot = spark.range(9000).select(
        F.lit(1).alias("k"), (F.col("id") * 2.0).alias("v")
    )
    rest = spark.range(1000).select(
        (F.col("id") % 50 + 2).cast("long").alias("k"),
        (F.col("id") * 3.0).alias("v"),
    )
    return hot.unionByName(rest).cache()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8,
                   str(tmp_path / "orders_b"), sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], 8,
        str(tmp_path / "lineitem_b"), sort_cols=["o_orderkey"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_tables_join(spark, "orders_b", "lineitem_b",
                                      ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 52)], "k long, name string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"]).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_rejects_outer_and_semi(spark, skewed):
    """The replicated right side duplicates unmatched right rows for
    right/full joins and breaks semi/anti semantics (ADVICE round 1)."""
    dim = spark.createDataFrame([(1, "one")], "k long, name string")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(skewed, dim, ["k"], how=how)


def test_two_phase_agg_equals_direct(spark, skewed):
    direct = {
        r.k: (r.n_rows, r.sum_v)
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").cast(DEC)).cast("double").alias("sum_v"),
        )
        .collect()
    }
    salted_df = two_phase_agg(
        skewed.withColumn("v", F.col("v").cast(DEC)), ["k"], sums=["v"]
    )
    two = {
        r.k: (r.n_rows, float(r.sum_v)) for r in salted_df.collect()
    }
    assert direct == two


def test_write_sorted_layout_skips(spark, tmp_path):
    """Range-partitioned + sorted write: a narrow range predicate's
    scan must report pushed filters and return the same rows as the
    unsorted scan; per-file stats must be tight (each file's span is
    a fraction of the global range)."""
    import pyspark.sql.functions as F

    from pyspark_airflow_weather_etl_spark.operators.scale import write_sorted

    df = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    )
    path = str(tmp_path / "sorted")
    write_sorted(df, path, ["k"], files_per_write=8)
    back = spark.read.parquet(path)
    assert back.count() == 100_000
    pred_lo, pred_hi = 10_000, 12_000
    got = back.where(F.col("k").between(pred_lo, pred_hi)).count()
    assert got == pred_hi - pred_lo + 1
    # tight per-file stats: no file spans more than ~2/8 of the range
    import pyarrow.parquet as pq
    import glob
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append(max(maxs) - min(mins))
    assert len(spans) == 8
    assert max(spans) < 100_000 / 4


def test_engine_writes_carry_timestamp_stats(spark, tmp_path):
    """Spark's default INT96 timestamp encoding carries NO parquet
    min/max statistics, which silently disables file skipping and
    row-group pruning on event-time range predicates. The engine
    forces TIMESTAMP_MICROS (session.py RUNTIME_CONFS); this guards
    the conf."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(1000).selectExpr(
        "timestamp_micros(cast(id * 1000000 as long)) AS ts"
    )
    p = str(tmp_path / "ts_stats")
    df.coalesce(1).write.parquet(p)
    f = glob.glob(p + "/*.parquet")[0]
    st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
    assert st is not None and st.has_min_max, (
        "timestamp column written without min/max stats — INT96 leak"
    )


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Z-order vs single-column sort: the x-sorted layout has tight
    x spans but full-range y spans per file (no skipping on y); the
    z-ordered layout has partial spans on BOTH columns, so range
    predicates on either column prune files. Results identical."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from pyspark_airflow_weather_etl_spark.operators.scale import (
        write_sorted,
        write_zordered,
    )

    df = spark.range(200_000).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("y"),
    )
    pz = str(tmp_path / "zorder")
    px = str(tmp_path / "xsorted")
    write_zordered(df, pz, ["x", "y"], bits=10, files_per_write=16)
    write_sorted(df, px, ["x"], files_per_write=16)

    def spans(path, col):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append(max(maxs) - min(mins))
        return out

    # x-sorted: x spans tiny, y spans ~full range in every file
    assert max(spans(px, "x")) < 250
    assert min(spans(px, "y")) > 900
    # z-order: BOTH columns partially bounded per file — each file
    # covers a rectangle of the (x, y) plane, not a stripe
    zx, zy = spans(pz, "x"), spans(pz, "y")
    assert sum(zx) / len(zx) < 600, f"x spans not bounded: {zx}"
    assert sum(zy) / len(zy) < 600, f"y spans not bounded: {zy}"

    # same rows under a 2-D range probe from either layout
    pred = (F.col("x").between(100, 200)) & (F.col("y").between(300, 400))
    n_z = spark.read.parquet(pz).where(pred).count()
    n_x = spark.read.parquet(px).where(pred).count()
    assert n_z == n_x > 0


class TestCompaction:
    """compact_table: layout-only rewrite — fewer files, identical
    rows, safe while reading its own target."""

    def test_flat_table_compacts(self, spark, tmp_path):
        from pyspark_airflow_weather_etl_spark.operators.scale import (
            _tree_bytes_and_files,
            compact_table,
        )

        path = str(tmp_path / "flat")
        spark.range(10_000).selectExpr(
            "id", "id * 2 AS v"
        ).repartition(40).write.parquet(path)
        _, files0 = _tree_bytes_and_files(spark, path)
        assert files0 >= 40
        before_rows = sorted(
            map(tuple, spark.read.parquet(path).collect())
        )
        b, a = compact_table(spark, path, target_file_bytes=1 << 30)
        assert (b, a) == (files0, 1)
        after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert after_rows == before_rows

    def test_partitioned_table_compacts_and_keeps_partitions(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from pyspark_airflow_weather_etl_spark.operators.scale import (
            _tree_bytes_and_files,
            compact_table,
        )

        path = str(tmp_path / "part")
        (
            spark.range(9_000)
            .select(
                (F.col("id") % 3).alias("y"),
                "id",
                (F.col("id") * 3).alias("v"),
            )
            .repartition(30)
            .write.partitionBy("y")
            .parquet(path)
        )
        _, files0 = _tree_bytes_and_files(spark, path)
        assert files0 >= 60  # ~30 files per partition value
        before_rows = sorted(
            map(tuple, spark.read.parquet(path).select("y", "id", "v").collect())
        )
        b, a = compact_table(
            spark, path, partition_cols=("y",), target_file_bytes=1 << 30
        )
        assert b == files0
        assert a <= 3  # at most one file per partition value here
        after = spark.read.parquet(path)
        after_rows = sorted(
            map(tuple, after.select("y", "id", "v").collect())
        )
        assert after_rows == before_rows
        # hive layout preserved: partition pruning still works
        plan = (
            after.where(F.col("y") == 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan and "y" in plan

    def test_oversized_partition_splits_into_target_files(
        self, spark, tmp_path
    ):
        """ADVICE r8 (medium): a multi-GB hive partition must not be
        rewritten as one serial giant file. One partition value (y=0)
        carries ~50x the bytes of the others; with a target under its
        size, compaction must emit MULTIPLE files for y=0 and exactly
        one for each small value — and identical rows."""
        import glob
        import os

        from pyspark.sql import functions as F

        from pyspark_airflow_weather_etl_spark.operators.scale import (
            _partition_value_bytes,
            compact_table,
        )

        path = str(tmp_path / "skewpart")
        big = spark.range(200_000).select(
            F.lit(0).alias("y"), "id", F.sha2(F.conv("id", 10, 16), 256).alias("v")
        )
        small = spark.range(2_000).select(
            (F.col("id") % 2 + 1).cast("int").alias("y"),
            "id",
            F.sha2(F.conv("id", 10, 16), 256).alias("v"),
        )
        big.unionByName(small).repartition(20).write.partitionBy("y").parquet(
            path
        )
        pv = _partition_value_bytes(spark, path, ("y",))
        assert set(pv) == {("0",), ("1",), ("2",)}
        # target sized so y=0 needs >=3 slots but y=1/y=2 need 1
        target = pv[("0",)] // 3
        assert target > max(pv[("1",)], pv[("2",)])
        before_rows = sorted(
            map(tuple, spark.read.parquet(path).select("y", "id", "v").collect())
        )
        compact_table(
            spark, path, partition_cols=("y",), target_file_bytes=target
        )
        files_by_y = {
            y: [
                f
                for f in glob.glob(os.path.join(path, f"y={y}", "*"))
                if not os.path.basename(f).startswith(("_", "."))
            ]
            for y in (0, 1, 2)
        }
        assert len(files_by_y[0]) >= 2, "giant partition stayed one file"
        assert len(files_by_y[1]) == 1 and len(files_by_y[2]) == 1
        after_rows = sorted(
            map(tuple, spark.read.parquet(path).select("y", "id", "v").collect())
        )
        assert after_rows == before_rows


def test_zorder_value_interleaves_bits(spark):
    from pyspark_airflow_weather_etl_spark.operators.scale import (
        zorder_value,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(5, 3), (0, 0), (65535, 0)], "a long, b long")
    got = [
        r.z
        for r in df.select(
            zorder_value("a", "b", bits=16).alias("z")
        ).collect()
    ]

    def py_z(a, b, bits=16):
        z = 0
        for j in range(bits):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    assert got == [py_z(5, 3), 0, py_z(65535, 0)]
    assert got[0] == 27


def test_write_zorder_skips_on_both_dimensions(spark, tmp_path):
    """Footer truth: a zorder layout's files carry selective min/max
    on BOTH columns — a narrow predicate on the NON-leading dimension
    matches fewer files than under a linear sort of the other column;
    and the layout never changes query answers."""
    import glob
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.scale import (
        write_sorted,
        write_zorder,
    )

    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 128).alias("a"),
            (F.col("id") / 128).cast("long").alias("b"),
            F.col("id").alias("v"),
        )
    )
    lin, zor = str(tmp_path / "lin"), str(tmp_path / "zor")
    write_sorted(df, lin, ["a"], files_per_write=16)
    write_zorder(df, zor, "a", "b", bits=8, files_per_write=16)

    def files_matching_b(path, lo, hi):
        match = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}["b"]
            st = md.row_group(0).column(idx).statistics
            fmin, fmax = st.min, st.max
            for rg in range(1, md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                fmin, fmax = min(fmin, s.min), max(fmax, s.max)
            total += 1
            if fmin <= hi and fmax >= lo:
                match += 1
        return match, total

    m_lin, t_lin = files_matching_b(lin, 10, 12)
    m_zor, t_zor = files_matching_b(zor, 10, 12)
    assert t_lin == t_zor == 16
    assert m_zor < m_lin, (m_zor, m_lin)
    # answers identical under both layouts
    pred = (F.col("b") >= 10) & (F.col("b") <= 12) & (F.col("a") < 40)
    r_lin = spark.read.parquet(lin).where(pred).agg(
        F.count("*"), F.sum("v")
    ).collect()
    r_zor = spark.read.parquet(zor).where(pred).agg(
        F.count("*"), F.sum("v")
    ).collect()
    assert r_lin == r_zor
