package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val w = Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gw.warehouse", w)
    TemporalTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"),
      s"$w/db/res")
    TemporalTable.write(Seq((1L, 11.0), (3L, 30.0)).toDF("node_key", "price"),
      s"$w/db/res")
    w
  }

  test("SQL reads the latest revision through the catalog") {
    warehouse
    val rows = spark.sql("SELECT node_key, price FROM gw.db.res ORDER BY node_key")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 11.0), (3L, 30.0)))
  }

  test("VERSION AS OF = jn:doc revision pin; TIMESTAMP AS OF = jn:open") {
    warehouse
    val v1 = spark.sql("SELECT node_key, price FROM gw.db.res VERSION AS OF 1 ORDER BY node_key")
      .as[(Long, Double)].collect().toSeq
    assert(v1 == Seq((1L, 10.0), (2L, 20.0)))
    // timestamp after the last commit resolves to the latest revision
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    val atNow = spark.sql(
      s"SELECT node_key FROM gw.db.res TIMESTAMP AS OF '$ts' ORDER BY node_key")
      .as[Long].collect().toSeq
    assert(atNow == Seq(1L, 3L))
  }

  test("SQL over a delta-encoded table reconstructs through the catalog") {
    warehouse
    // own namespace: the shared `db` namespace's SHOW TABLES counts are
    // asserted elsewhere
    val p = s"$warehouse/deltadb/dres"
    DeltaTemporalTable.write(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price"), p, snapshotEvery = 4)
    DeltaTemporalTable.write(spark,
      Seq((1L, 11.0), (3L, 30.0)).toDF("node_key", "price"), p, snapshotEvery = 4)
    val latest = spark.sql("SELECT node_key, price FROM gw.deltadb.dres ORDER BY node_key")
      .as[(Long, Double)].collect().toSeq
    assert(latest == Seq((1L, 11.0), (3L, 30.0)))
    val v1 = spark.sql(
      "SELECT node_key, price FROM gw.deltadb.dres VERSION AS OF 1 ORDER BY node_key")
      .as[(Long, Double)].collect().toSeq
    assert(v1 == Seq((1L, 10.0), (2L, 20.0)))
  }

  test("catalog DDL surface: SHOW, EXISTS, DROP") {
    warehouse
    val tables = spark.sql("SHOW TABLES IN gw.db").select("tableName")
      .as[String].collect().toSeq
    assert(tables == Seq("res"))
    TemporalTable.write(Seq((9L, 1.0)).toDF("node_key", "v"), s"$warehouse/db/tmp")
    assert(spark.sql("SHOW TABLES IN gw.db").count() == 2)
    spark.sql("DROP TABLE gw.db.tmp")
    assert(spark.sql("SHOW TABLES IN gw.db").count() == 1)
    intercept[Exception] { spark.sql("SELECT * FROM gw.db.missing").collect() }
  }

  test("V2 append and SQL INSERT commit revisions; no rev shadow column in the files") {
    warehouse
    // own table: this test advances the head, which must not perturb the
    // shared fixture other tests read
    val t = s"$warehouse/db/ins"
    TemporalTable.write(Seq((1L, 10.0), (3L, 30.0)).toDF("node_key", "price"), t)
    val before = TemporalTable.mostRecentRevision(t).get
    Seq((9L, 90.0)).toDF("node_key", "price")
      .write.format("graft-temporal").mode("append").save(t)
    val after = TemporalTable.mostRecentRevision(t).get
    assert(after == before + 1)
    // revision semantics (new head = the written snapshot), catalog reads it
    val head = spark.sql("SELECT node_key, price FROM gw.db.ins ORDER BY node_key")
      .as[(Long, Double)].collect().toSeq
    assert(head == Seq((9L, 90.0)))
    // prior revisions remain time-travel readable
    val prior = spark.sql(
        s"SELECT node_key FROM gw.db.ins VERSION AS OF $before ORDER BY node_key")
      .as[Long].collect().toSeq
    assert(prior == Seq(1L, 3L))
    // V2 append maintains the sidecars like a TemporalTable.write commit
    assert(MetaIO.exists(s"${TemporalTable.keyIndexDir(t)}/rev=$after"))
    // SQL INSERT resolves the full table schema incl. the rev partition
    // axis - NULL means "storage-assigned" and commits the next revision
    spark.sql("INSERT INTO gw.db.ins SELECT 10L AS node_key, 1.0 AS price, CAST(NULL AS INT) AS rev")
    val afterInsert = TemporalTable.mostRecentRevision(t).get
    assert(afterInsert == after + 1)
    assert(spark.sql(s"SELECT node_key FROM gw.db.ins VERSION AS OF $afterInsert")
      .as[Long].head() == 10L)
    // an EXPLICIT rev value would be silently lost if accepted - reject
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gw.db.ins SELECT 11L AS node_key, 2.0 AS price, 777 AS rev")
    }
    assert(e.getMessage.contains("storage-assigned") ||
      Option(e.getCause).exists(_.getMessage.contains("storage-assigned")),
      s"unexpected error: ${e.getMessage}")
    assert(TemporalTable.mostRecentRevision(t).get == afterInsert)
    // the padded rev slot must NOT land as a data column in the files
    (before + 1 to afterInsert).foreach { r =>
      val written = spark.read.parquet(s"$t/rev=$r")
      assert(!written.columns.contains("rev"),
        s"rev=$r files carry a rev shadow column: ${written.columns.toSeq}")
    }
    TemporalTable.drop(t)
  }

  test("hostile identifiers and phantom revisions are rejected") {
    warehouse
    // path traversal: backquoted identifier parts must not escape the root
    intercept[Exception] { spark.sql("SELECT * FROM gw.`..`.`etc`").collect() }
    intercept[Exception] { spark.sql("DROP NAMESPACE gw.`..` CASCADE") }
    // VERSION AS OF must validate against the commit log, not the dirs:
    // stage an uncommitted rev directory and try to read it
    Seq((99L, 0.0)).toDF("node_key", "price")
      .write.parquet(s"$warehouse/db/res/rev=7")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gw.db.res VERSION AS OF 7").collect()
    }
    assert(!e.getMessage.contains("Path does not exist"),
      "must be a version-not-found, not a raw parquet error")
    intercept[Exception] {
      spark.sql("SELECT * FROM gw.db.res VERSION AS OF 99").collect()
    }
  }

  test("pushdown still reaches the scan through the catalog") {
    warehouse
    val q = spark.sql("SELECT price FROM gw.db.res WHERE node_key = 1")
    assert(q.as[Double].head() == 11.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("node_key"),
      s"filter must push into the parquet scan:\n$plan")
  }
}
