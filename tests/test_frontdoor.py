"""SQL front-door tests: replay the reference workshop's %%sql narrative
(docs/02-lab-optimizations.md) statement-for-statement against GraftCatalog —
create, query, OPTIMIZE (+VORDER/ZORDER), history, time travel, DELETE,
RESTORE, VACUUM, TBLPROPERTIES — plus pass-through of ordinary SQL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.frontdoor import GraftCatalog

from .conftest import SF_DIR


@pytest.fixture()
def cat(spark, tmp_path):
    c = GraftCatalog(spark)
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .repartition(8)
    )
    c.create("sales", df, str(tmp_path / "sales"))
    return c


def test_passthrough_select(cat):
    n = cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]
    assert n > 0
    # flagship-style conjunctive filter (reference :98-102) passes through
    got = cat.sql(
        "SELECT COUNT(*) AS n FROM sales WHERE o_orderstatus = 'F' AND o_totalprice > 1000"
    ).collect()[0]["n"]
    assert 0 < got < n


def test_optimize_statement(cat):
    before = len(cat.table("sales").snapshot().files)
    res = cat.sql("OPTIMIZE sales").collect()[0]
    assert res["operation"] == "OPTIMIZE"
    assert len(cat.table("sales").snapshot().files) < before
    # view was refreshed — queries keep working on the new snapshot
    assert cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"] > 0


def test_optimize_vorder_zorder(cat):
    cat.sql("OPTIMIZE sales ZORDER BY (o_custkey, o_totalprice) VORDER")
    snap = cat.table("sales").snapshot()
    assert snap.properties.get("vorder.enabled") == "true"
    ops = [r["operation"] for r in cat.sql("DESCRIBE HISTORY sales").collect()]
    assert ops[0] == "OPTIMIZE"


def test_time_travel_and_delete_restore(cat):
    n0 = cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]

    cat.sql("DELETE FROM sales WHERE o_orderstatus = 'F'")
    n1 = cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]
    assert n1 < n0

    # reference :210 — count at VERSION AS OF 0 sees pre-delete data
    nv0 = cat.sql("SELECT COUNT(*) AS n FROM sales VERSION AS OF 0").collect()[0]["n"]
    assert nv0 == n0

    # reference :268-287 — restore becomes a NEW version
    res = cat.sql("RESTORE TABLE sales TO VERSION AS OF 0").collect()[0]
    assert res["newVersion"] == 2
    assert cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"] == n0


def test_timestamp_as_of_sql(cat):
    import datetime as dt

    c0 = cat.table("sales").commits()[0]
    cat.sql("DELETE FROM sales WHERE o_orderstatus = 'F'")
    ts = dt.datetime.fromtimestamp(c0.timestamp_ms / 1000, tz=dt.timezone.utc)
    n = cat.sql(
        f"SELECT COUNT(*) AS n FROM sales TIMESTAMP AS OF '{ts.isoformat()}'"
    ).collect()[0]["n"]
    assert n == cat.table("sales").load(version=0).count()


def test_vacuum_statements(cat):
    cat.sql("OPTIMIZE sales")
    dry = cat.sql("VACUUM sales RETAIN 0 HOURS DRY RUN").collect()
    assert len(dry) > 0
    gone = cat.sql("VACUUM sales RETAIN 0 HOURS").collect()
    assert {r["path"] for r in gone} == {r["path"] for r in dry}
    # current read unaffected
    assert cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"] > 0


def test_describe_detail_and_tblproperties(cat):
    d = cat.sql("DESCRIBE DETAIL sales").collect()[0]
    assert d["numFiles"] == 8
    # reference :621-628
    cat.sql(
        "ALTER TABLE sales SET TBLPROPERTIES ('delta.stats.extended.collect' = 'true')"
    )
    assert (
        cat.table("sales").snapshot().properties["delta.stats.extended.collect"]
        == "true"
    )
    rows = cat.sql("DESCRIBE EXTENDED sales").collect()
    assert any("delta.stats.extended.collect" in r["col_name"] for r in rows)


def test_create_table_location(cat, spark, tmp_path):
    path = str(cat.table("sales").path)
    cat2 = GraftCatalog(spark)
    cat2.sql(f"CREATE TABLE IF NOT EXISTS sales2 USING DELTA LOCATION '{path}'")
    assert cat2.sql("SELECT COUNT(*) AS n FROM sales2").collect()[0]["n"] > 0


def test_join_against_registered_view(cat, spark):
    # front-door tables interoperate with ordinary temp views in one query
    spark.read.parquet(f"{SF_DIR}/customer.parquet").createOrReplaceTempView("customer")
    out = cat.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n
        FROM sales s JOIN customer c ON s.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )
    assert out.count() > 0


def test_merge_statement(cat, spark):
    n0 = cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]
    max_key = cat.sql("SELECT MAX(o_orderkey) AS m FROM sales").collect()[0]["m"]
    cat.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(0.0 AS DOUBLE) AS o_totalprice, o_orderdate
        FROM sales LIMIT 5
        """
    ).createOrReplaceTempView("updates_src")
    spark.sql(
        f"""
        SELECT * FROM updates_src
        UNION ALL
        SELECT CAST({max_key} + 1 AS BIGINT), CAST(1 AS BIGINT), 'O',
               CAST(0.0 AS DOUBLE), TIMESTAMP '1997-01-01 00:00:00'
        """
    ).createOrReplaceTempView("merge_src")

    res = cat.sql(
        """
        MERGE INTO sales t USING merge_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    ).collect()[0]
    assert res["numTargetFilesRewritten"] >= 1
    n1 = cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]
    assert n1 == n0 + 1
    zeroed = cat.sql(
        "SELECT COUNT(*) AS n FROM sales WHERE o_totalprice = 0.0"
    ).collect()[0]["n"]
    assert zeroed == 6


def test_update_statement(cat):
    n_f = cat.sql("SELECT COUNT(*) AS n FROM sales WHERE o_orderstatus = 'F'").collect()[0]["n"]
    assert n_f > 0
    res = cat.sql(
        "UPDATE sales SET o_totalprice = o_totalprice * 2, o_orderstatus = 'X' "
        "WHERE o_orderstatus = 'F'"
    ).collect()[0]
    assert res["numRewrittenFiles"] >= 1
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM sales WHERE o_orderstatus = 'F'"
    ).collect()[0]["n"] == 0
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM sales WHERE o_orderstatus = 'X'"
    ).collect()[0]["n"] == n_f
    # untouched rows unchanged, update is time-travelable
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM sales VERSION AS OF 0 WHERE o_orderstatus = 'F'"
    ).collect()[0]["n"] == n_f


def test_clone_and_constraint_statements(cat, tmp_path):
    from delta_lake_optimizations_spark.table.graft_table import (
        ConstraintViolationError,
    )

    loc = str(tmp_path / "sales_clone")
    res = cat.sql(f"CREATE TABLE sales_copy SHALLOW CLONE sales LOCATION '{loc}'").collect()[0]
    assert res["shallow"] == "true"
    n = cat.sql("SELECT COUNT(*) AS n FROM sales_copy").collect()[0]["n"]
    assert n == cat.sql("SELECT COUNT(*) AS n FROM sales").collect()[0]["n"]

    cat.sql("ALTER TABLE sales_copy ADD CONSTRAINT pos_price CHECK (o_totalprice >= 0)")
    assert "constraint.pos_price" in cat.table("sales_copy").snapshot().properties
    import pytest as _pytest

    bad = cat.table("sales_copy").load().limit(1).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(-1.0 AS DOUBLE) AS o_totalprice", "o_orderdate",
    )
    with _pytest.raises(ConstraintViolationError):
        cat.table("sales_copy").write(bad, mode="append")
    cat.sql("ALTER TABLE sales_copy DROP CONSTRAINT pos_price")
    cat.table("sales_copy").write(bad, mode="append")


def test_optimize_where_statement(cat, spark, tmp_path):
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumn("o_year", F.year("o_orderdate"))
        .repartition(4)
    )
    cat.create("po", df, str(tmp_path / "po"), partition_by=["o_year"])
    snap0 = cat.table("po").snapshot()
    year = sorted({f.partition_values["o_year"] for f in snap0.files})[0]
    res = cat.sql(f"OPTIMIZE po WHERE o_year = {year}").collect()[0]
    assert res["operation"] == "OPTIMIZE"
    others0 = {f.path for f in snap0.files if f.partition_values["o_year"] != year}
    others1 = {
        f.path for f in cat.table("po").snapshot().files
        if f.partition_values["o_year"] != year
    }
    assert others0 == others1  # untouched partitions carried over


def test_analyze_table_statement(cat, spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(4)
    cat.create("ana", df, str(tmp_path / "ana"))
    cat.sql("OPTIMIZE ana")
    try:
        res = cat.sql("ANALYZE TABLE ana COMPUTE STATISTICS FOR ALL COLUMNS").collect()[0]
        assert res["catalogTable"] == "ana_cbo"
        assert int(res["rowCount"]) == cat.table("ana").load().count()
        # the CBO now sees an exact row count on the catalog table
        from delta_lake_optimizations_spark.stats import plan_stats

        assert plan_stats(spark.table("ana_cbo"))["rowCount"] == int(res["rowCount"])
    finally:
        spark.sql("DROP TABLE IF EXISTS ana_cbo")


def test_merge_on_clause_rejects_non_equi_terms(cat, spark):
    """The ON parser accepts only same-named alias.col = alias.col terms;
    a filter term like t.region = 'EU' must raise, not silently become a
    merge key (which would change the semantics vs real MERGE INTO)."""
    import pytest

    cat.sql("SELECT o_orderkey, o_custkey FROM sales LIMIT 1").createOrReplaceTempView(
        "bad_src"
    )
    for bad_on in (
        "t.o_orderkey = s.o_orderkey AND t.o_orderstatus = 'O'",
        "t.o_orderkey = s.o_custkey",
        "t.o_orderkey < s.o_orderkey",
    ):
        with pytest.raises(ValueError, match="unsupported MERGE ON term"):
            cat.sql(
                f"""
                MERGE INTO sales t USING bad_src s
                ON {bad_on}
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
                """
            )


def test_bloomfilter_index_statements(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.frontdoor import GraftCatalog
    from delta_lake_optimizations_spark.table import GraftTable

    df = spark.range(2000).select(
        "id", F.concat(F.lit("k"), F.col("id")).alias("k")
    ).repartition(6, "id")
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df)
    cat = GraftCatalog(spark)
    cat.register("bt", str(tmp_path / "t"))

    out = cat.sql(
        "CREATE BLOOMFILTER INDEX ON TABLE bt FOR COLUMNS(k) OPTIONS (fpp=0.001)"
    ).collect()[0]
    assert out["filesIndexed"] == 6
    assert t.files_scanned(skip_where=[("k", "=", "k123")]) == 1
    # absent but INSIDE every file's min/max range: only the bloom prunes it
    assert t.files_scanned(skip_where=[("k", "=", "k123x")]) == 0

    dropped = cat.sql("DROP BLOOMFILTER INDEX ON TABLE bt FOR COLUMNS(k)").collect()[0]
    assert dropped["sidecarsDropped"] == 1
    assert t.files_scanned(skip_where=[("k", "=", "k123x")]) == 6  # back to scan-all


def test_alter_table_cluster_by(spark, tmp_path):
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog
    from delta_lake_optimizations_spark.table import GraftTable, optimize

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(8)
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df)
    cat = GraftCatalog(spark)
    cat.register("ct", str(tmp_path / "t"))

    out = cat.sql("ALTER TABLE ct CLUSTER BY (l_partkey, l_suppkey)").collect()[0]
    assert out["clusterBy"] == "l_partkey,l_suppkey"
    optimize(t, target_files=4)  # bare OPTIMIZE picks up the declared key
    assert t.commits()[-1].operation_parameters.get("zOrderBy") == [
        "l_partkey", "l_suppkey",
    ]

    cat.sql("ALTER TABLE ct CLUSTER BY NONE")
    optimize(t, target_files=4)
    assert "zOrderBy" not in t.commits()[-1].operation_parameters


def test_convert_to_delta_sql(spark, tmp_path):
    """CONVERT TO DELTA parquet.`/path` registers existing files in place
    (Delta-parity syntax; GRAFT also accepted)."""
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    from .conftest import SF_DIR

    d = str(tmp_path / "plain")
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.parquet(d)
    cat = GraftCatalog(spark)
    out = cat.sql(f"CONVERT TO DELTA parquet.`{d}`").collect()[0]
    assert out["numFiles"] >= 1 and out["numRecords"] == 5
    t = cat.register("region_conv", d)
    assert t.load().count() == 5


def test_show_partitions_from_log_only(spark, tmp_path):
    """SHOW PARTITIONS answers from commit-log metadata: values, file and
    row counts per partition; unpartitioned tables are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    from .conftest import SF_DIR

    cat = GraftCatalog(spark)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    cat.create("orders_p", orders, str(tmp_path / "op"), partition_by=["o_year"])
    rows = cat.sql("SHOW PARTITIONS orders_p").collect()
    got = {r["o_year"]: r["numRecords"] for r in rows}
    want = {
        str(r["o_year"]): r["n"]
        for r in orders.groupBy("o_year").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert all(r["numFiles"] >= 1 for r in rows)

    cat.create("orders_flat", orders.drop("o_year"), str(tmp_path / "of"))
    with _pytest.raises(ValueError, match="not partitioned"):
        cat.sql("SHOW PARTITIONS orders_flat")


def test_cached_sql_hits_and_invalidates_on_version_change(spark, tmp_path):
    """cached_sql returns the SAME persisted frame while referenced table
    versions are unchanged, and transparently recomputes after a commit
    moves any referenced table forward."""
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    from .conftest import SF_DIR

    cat = GraftCatalog(spark)
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    cat.create("sup_cache", sup, str(tmp_path / "sc"))

    q = "SELECT s_nationkey, COUNT(*) AS n FROM sup_cache GROUP BY s_nationkey"
    a = cat.cached_sql(q)
    b = cat.cached_sql(q)
    assert a is b  # cache hit: identical persisted frame
    n0 = {r["s_nationkey"]: r["n"] for r in a.collect()}

    # a commit on the referenced table invalidates the entry
    t = cat.table("sup_cache")
    t.write(sup.limit(5), mode="append")
    cat._refresh("sup_cache")
    c = cat.cached_sql(q)
    assert c is not a
    n1 = {r["s_nationkey"]: r["n"] for r in c.collect()}
    assert sum(n1.values()) == sum(n0.values()) + 5
    # and the new entry is itself cached
    assert cat.cached_sql(q) is c


def test_restore_to_timestamp_sql(spark, tmp_path):
    """RESTORE TABLE t TO TIMESTAMP AS OF '<ts>' resolves the timestamp
    to the version live at that moment (Delta-parity syntax)."""
    import datetime as dt

    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    from .conftest import SF_DIR

    cat = GraftCatalog(spark)
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    cat.create("sup_r", sup, str(tmp_path / "sr"))
    t = cat.table("sup_r")
    n0 = t.load().count()
    c0 = t.commits()[0]
    ts = dt.datetime.fromtimestamp(
        c0.timestamp_ms / 1000, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    cat.sql("DELETE FROM sup_r WHERE s_suppkey % 2 = 0")
    assert t.load().count() < n0
    out = cat.sql(f"RESTORE TABLE sup_r TO TIMESTAMP AS OF '{ts}'").collect()[0]
    assert out["restoredVersion"] == 0
    assert cat.table("sup_r").load().count() == n0


def test_insert_into_and_overwrite_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    cat.create("ins_t", df, str(tmp_path / "ins_t"))
    cat.sql("INSERT INTO ins_t SELECT k + 100 AS k, bucket FROM ins_t")
    assert cat.sql("SELECT COUNT(*) AS n FROM ins_t").first()["n"] == 20
    cat.sql("INSERT INTO ins_t VALUES (999, 1)")
    assert cat.sql("SELECT COUNT(*) AS n FROM ins_t WHERE k = 999").first()["n"] == 1
    cat.sql("INSERT OVERWRITE ins_t SELECT CAST(1 AS BIGINT) AS k, CAST(0 AS BIGINT) AS bucket")
    assert cat.sql("SELECT COUNT(*) AS n FROM ins_t").first()["n"] == 1


def test_insert_overwrite_replace_where_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    cat.create("rw_t", df, str(tmp_path / "rw_t"), partition_by=["bucket"])
    cat.sql(
        "INSERT OVERWRITE rw_t REPLACE WHERE bucket = 1 "
        "SELECT CAST(777 AS BIGINT) AS k, CAST(1 AS BIGINT) AS bucket"
    )
    out = cat.sql("SELECT bucket, COUNT(*) AS n FROM rw_t GROUP BY bucket ORDER BY bucket")
    rows = {r["bucket"]: r["n"] for r in out.collect()}
    assert rows == {0: 10, 1: 1}


def test_table_changes_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(5).select(F.col("id").alias("k"))
    cat.create("cdf_t", df, str(tmp_path / "cdf_t"))
    cat.sql("INSERT INTO cdf_t VALUES (100)")
    cat.sql("DELETE FROM cdf_t WHERE k = 0")
    out = cat.sql(
        "SELECT _change_type, COUNT(*) AS n FROM table_changes('cdf_t', 0) "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    got = {r["_change_type"]: r["n"] for r in out}
    assert got == {"insert": 1, "delete": 1}
    # range form: only the insert commit
    out2 = cat.sql("SELECT COUNT(*) AS n FROM table_changes('cdf_t', 0, 1)").first()["n"]
    assert out2 == 1


def test_create_table_as_select_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    base = spark.range(20).select(F.col("id").alias("k"), (F.col("id") % 2).alias("b"))
    cat.create("ctas_src", base, str(tmp_path / "ctas_src"))
    cat.sql(
        f"CREATE TABLE ctas_dst PARTITIONED BY (b) LOCATION '{tmp_path}/ctas_dst' "
        "AS SELECT k, b FROM ctas_src WHERE k < 10"
    )
    t = cat.table("ctas_dst")
    assert t.load().count() == 10
    assert t.snapshot().partition_columns == ["b"]
    assert cat.sql("SELECT COUNT(*) AS n FROM ctas_dst").first()["n"] == 10


def test_reorg_and_fsck_sql(spark, tmp_path):
    import os as _os

    cat = GraftCatalog(spark)
    df = spark.range(50).select(F.col("id").alias("k"))
    cat.create("mnt_t", df, str(tmp_path / "mnt_t"))
    cat.sql("DELETE FROM mnt_t WHERE k < 5")
    out = cat.sql("REORG TABLE mnt_t APPLY (PURGE)").first()
    assert out["table"] == "mnt_t"
    t = cat.table("mnt_t")
    victim = t.snapshot().files[0]
    _os.remove(_os.path.join(t.path, victim.path))
    dry = cat.sql("FSCK REPAIR TABLE mnt_t DRY RUN").first()
    assert dry["numMissingFiles"] == 1 and dry["dryRun"] == "true"
    fixed = cat.sql("FSCK REPAIR TABLE mnt_t").first()
    assert fixed["numMissingFiles"] == 1 and fixed["dryRun"] == "false"
    assert cat.sql("SELECT COUNT(*) AS n FROM mnt_t").first()["n"] == t.load().count()


def test_show_tblproperties_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(5).select(F.col("id").alias("k"))
    cat.create("props_t", df, str(tmp_path / "props_t"))
    cat.sql("ALTER TABLE props_t SET TBLPROPERTIES ('graft.cluster.by' = 'k')")
    rows = {r["key"]: r["value"] for r in cat.sql("SHOW TBLPROPERTIES props_t").collect()}
    assert rows.get("graft.cluster.by") == "k"


def test_add_column_sql_and_null_fill(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(5).select(F.col("id").alias("k"))
    cat.create("addc_t", df, str(tmp_path / "addc_t"))
    before = {f.path for f in cat.table("addc_t").snapshot().files}
    cat.sql("ALTER TABLE addc_t ADD COLUMN score double")
    t = cat.table("addc_t")
    assert {f.path for f in t.snapshot().files} == before, "metadata-only"
    out = cat.sql("SELECT k, score FROM addc_t")
    assert out.count() == 5
    assert out.filter(F.col("score").isNull()).count() == 5, "old files null-fill"
    # future appends must carry the column
    cat.sql("INSERT INTO addc_t VALUES (99, 0.5)")
    assert cat.sql("SELECT COUNT(*) AS n FROM addc_t WHERE score = 0.5").first()["n"] == 1


def test_graft_files_metadata_function(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 2).alias("b"))
    cat.create("ft_t", df, str(tmp_path / "ft_t"), partition_by=["b"])
    out = cat.sql(
        "SELECT COUNT(*) AS n_files, SUM(num_records) AS rows FROM graft_files('ft_t')"
    ).first()
    snap = cat.table("ft_t").snapshot()
    assert out["n_files"] == len(snap.files)
    assert out["rows"] == 100


def test_create_table_with_schema_and_identity_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    cat.sql(
        "CREATE TABLE sch_t (id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 10 INCREMENT BY 5), name STRING, score DOUBLE) "
        f"LOCATION '{tmp_path}/sch_t'"
    )
    t = cat.table("sch_t")
    assert [f.name for f in t.snapshot().schema.fields] == ["id", "name", "score"]
    assert t.load().count() == 0
    props = t.snapshot().properties
    assert props["graft.identity.id"] == "start=10,step=5,always=true"


def test_create_schema_identity_allocates(spark, tmp_path):
    cat = GraftCatalog(spark)
    cat.sql(
        "CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 10 INCREMENT BY 5), name STRING) "
        f"LOCATION '{tmp_path}/idt'"
    )
    t = cat.table("idt")
    t.write(
        spark.createDataFrame([("a",), ("b",), ("c",)], "name string"),
        mode="append",
    )
    ids = sorted(r["id"] for r in t.load().collect())
    assert ids == [10, 15, 20]


def test_truncate_table_sql(spark, tmp_path):
    cat = GraftCatalog(spark)
    df = spark.range(50).select(F.col("id").alias("k"))
    cat.create("tr_t", df, str(tmp_path / "tr_t"))
    v = cat.table("tr_t").latest_version()
    cat.sql("TRUNCATE TABLE tr_t")
    assert cat.sql("SELECT COUNT(*) AS n FROM tr_t").first()["n"] == 0
    assert cat.table("tr_t").load(version=v).count() == 50, "time travel intact"
    cat.sql("INSERT INTO tr_t VALUES (7)")
    assert cat.sql("SELECT COUNT(*) AS n FROM tr_t").first()["n"] == 1


def test_generate_symlink_manifest(spark, tmp_path):
    """GENERATE symlink_format_manifest parity: manifests list exactly
    the active snapshot's absolute file paths (per partition dir for a
    partitioned table), regeneration drops stale entries, and tables
    with deletion vectors are refused."""
    import os

    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.frontdoor import GraftCatalog
    from delta_lake_optimizations_spark.table import GraftTable, optimize

    df = spark.range(200).select(
        "id", (F.col("id") % 2 == 0).cast("string").alias("even")
    )
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df, partition_by=["even"])
    cat = GraftCatalog(spark)
    cat.register("mt", str(tmp_path / "t"))

    out = cat.sql("GENERATE symlink_format_manifest FOR TABLE mt").collect()[0]
    root = out["manifestRoot"]
    assert out["numManifests"] == 2  # even=true / even=false
    listed = set()
    for d in ("even=true", "even=false"):
        with open(os.path.join(root, d, "manifest")) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        assert all(ln.startswith("file:") for ln in lines)
        listed.update(ln[len("file:"):] for ln in lines)
    snap_paths = {os.path.join(t.path, f.path) for f in t.snapshot().files}
    assert listed == snap_paths
    assert all(os.path.exists(p) for p in listed)

    # regeneration after OPTIMIZE reflects the NEW file set only
    optimize(t, target_files=1)
    cat.sql("GENERATE symlink_format_manifest FOR TABLE mt")
    relisted = set()
    for d in ("even=true", "even=false"):
        with open(os.path.join(root, d, "manifest")) as fh:
            relisted.update(ln.strip()[len("file:"):] for ln in fh if ln.strip())
    assert relisted == {os.path.join(t.path, f.path) for f in t.snapshot().files}
    assert relisted != snap_paths

    # DV-carrying tables are refused (external readers can't apply DVs)
    from delta_lake_optimizations_spark.table import delete

    delete(t, "id = 7", deletion_vectors=True)
    assert any(f.dv_count for f in t.snapshot().files)
    import pytest

    with pytest.raises(ValueError, match="deletion vectors"):
        cat.sql("GENERATE symlink_format_manifest FOR TABLE mt")
