package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 10.0, Some(1.0)), (2L, 20.0, Some(2.0)), (3L, 20.0, None),
    (4L, 40.0, Some(4.0)), (5L, 50.0, Some(4.0))
  ).toDF("id", "v", "opt")

  test("columnStats profiles rows, nulls, ndv, min, max per column") {
    val got = Stats.columnStats(df, Seq("v", "opt"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got(0) == ("opt", 5L, 4L, 3L, 1.0, 4.0))
    assert(got(1) == ("v", 5L, 5L, 4L, 10.0, 50.0))
  }

  test("approxColumnStats agrees with exact on small-cardinality data") {
    val exact = Stats.columnStats(df, Seq("v")).select("ndv").as[Long].head()
    val approx = Stats.approxColumnStats(df, Seq("v")).select("ndv").as[Long].head()
    assert(approx == exact)
  }

  test("equiWidthHistogram covers the domain; counts sum to non-null rows") {
    val h = Stats.equiWidthHistogram(df, "v", 4)
      .orderBy("bucket").as[(Long, Double, Double, Long)].collect()
    assert(h.map(_._4).sum == 5L)
    assert(h.head._2 == 10.0 && h.last._3 == 50.0)
    // max value lands in the (closed) top bucket, not beyond it
    assert(h.last._1 == 3L)
  }

  test("constant column collapses to a single bucket") {
    val c = Seq(1.0, 1.0, 1.0).toDF("v")
    val h = Stats.equiWidthHistogram(c, "v", 8)
      .as[(Long, Double, Double, Long)].collect()
    assert(h.length == 1 && h.head._1 == 0L && h.head._4 == 3L)
  }

  test("quantiles returns interpolated boundaries in order") {
    val q = Stats.quantiles(df, "v", Seq(0.0, 0.5, 1.0))
      .orderBy("q").as[(Double, Double)].collect()
    assert(q.map(_._1).toSeq == Seq(0.0, 0.5, 1.0))
    assert(q.head._2 == 10.0 && q(1)._2 == 20.0 && q.last._2 == 50.0)
  }

  test("distributed exact quantiles bit-match the percentile aggregate") {
    val rnd = new scala.util.Random(41)
    val data = Seq.fill(997)(rnd.nextDouble() * 1000 - 500) ++ Seq.fill(13)(7.25)
    val ddf = data.toDF("x").repartition(7)
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val dist = Stats.quantiles(ddf, "x", qs).orderBy("q")
      .as[(Double, Double)].collect().toSeq
    val viaSql = ddf.selectExpr(
        s"percentile(CAST(x AS DOUBLE), array(${qs.mkString(",")})) AS a")
      .selectExpr("explode(a) AS v").as[Double].collect().toSeq
      .map(v => math.rint(v * 10000) / 10000) // same 4dp display rounding
    assert(dist.map(_._2) == viaSql,
      s"distributed ${dist.map(_._2)} != aggregate $viaSql")
    // all-null column → null quantiles, like the aggregate
    val nulls = Seq[Option[Double]](None, None).toDF("x")
    assert(Stats.quantiles(nulls, "x", Seq(0.5)).select("value")
      .as[Option[Double]].head().isEmpty)
  }

  test("pearson matches known correlations and ignores null pairs") {
    val perfect = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    assert(Stats.pearson(perfect, "x", "y").select("r").as[Double].head() == 1.0)
    val anti = Seq((1.0, 4.0), (2.0, 3.0), (3.0, 2.0), (4.0, 1.0)).toDF("x", "y")
    assert(Stats.pearson(anti, "x", "y").select("r").as[Double].head() == -1.0)
    val withNulls = Seq((Some(1.0), Some(2.0)), (Some(2.0), None), (None, Some(5.0)),
      (Some(3.0), Some(6.0))).toDF("x", "y")
    val r = Stats.pearson(withNulls, "x", "y").as[(Long, Double)].head()
    assert(r._1 == 2L && r._2 == 1.0)
  }

  test("equiDepthHistogram balances counts and labels bucket bounds") {
    val big = (1 to 1000).map(_.toDouble).toDF("v")
    val h = Stats.equiDepthHistogram(big, "v", 4)
      .orderBy("bucket").as[(Long, Double, Double, Long)].collect()
    assert(h.length == 4)
    assert(h.map(_._4).sum == 1000L)
    // each bucket holds ~250 rows (boundary rows tip one side)
    assert(h.forall(b => b._4 >= 249 && b._4 <= 251), h.mkString(","))
    assert(h.head._2 == 1.0 && h.last._3 == 1000.0)
  }

  test("analyzeForCbo lands rowCount + column histograms in the catalog and the plan") {
    spark.sql("DROP TABLE IF EXISTS stats_cbo_spec")
    val dir = java.nio.file.Files.createTempDirectory("graft-cbo").resolve("t").toString
    (1 to 500).map(i => (i.toLong, (i % 37).toDouble)).toDF("id", "v")
      .write.option("path", dir).saveAsTable("stats_cbo_spec")
    Stats.analyzeForCbo(spark, "stats_cbo_spec", Seq("id", "v"), nBuckets = 16)
    // histogram-collection conf is restored after the call
    assert(spark.conf.get("spark.sql.statistics.histogram.enabled") == "false")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("stats_cbo_spec"))
    val colStats = meta.stats.get.colStats
    assert(meta.stats.get.rowCount.contains(BigInt(500)))
    assert(colStats("v").histogram.exists(_.bins.length == 16),
      s"no 16-bin histogram on v: ${colStats("v")}")
    // ANALYZE's NDV is HLL-approximate
    assert(colStats("id").distinctCount.exists(d => d > BigInt(400) && d < BigInt(600)))
    // with CBO on, the optimized plan carries the stats estimates
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("stats_cbo_spec").filter($"v" < 5.0)
        .queryExecution.optimizedPlan
      val est = plan.stats.rowCount
      // 5 of 37 residues → ~68 rows; histogram-based estimate must be in
      // that neighbourhood, nowhere near the unfiltered 500
      assert(est.exists(r => r > BigInt(20) && r < BigInt(200)),
        s"filter selectivity not histogram-informed: $est")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }
}
