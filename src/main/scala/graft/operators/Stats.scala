package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column statistics and histograms — the Spark analog of the reference's
  * cost-model statistics layer (equi-depth `stats/Histogram.java:23`,
  * `CardinalityEstimator.java:23`, `StatisticsCatalog.java` under
  * bundles/sirix-query/src/main/java/io/sirix/query/optimizer/), which
  * feeds its CostBasedStage. On Spark the consumer is
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` + CBO; these
  * operators expose the same profiles as queryable DataFrames for
  * pipeline-level decisions (partition sizing, skew detection, stratum
  * weighting).
  *
  * Scale notes: every profile is a single scan folding map-side into a
  * handful of rows. Exact NDV uses Spark's multi-distinct Expand plan
  * (one scan, ×#cols row expansion before partial aggregation) — at
  * 100 TB prefer [[approxColumnStats]], whose HLL sketches fold without
  * expansion and merge in one exchange.
  */
object Stats {

  /** Long-format profile of numeric columns: per column one row of
    * (col_name, n_rows, n_nonnull, ndv, min_d, max_d). Exact NDV. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => count_distinct(col(c)))

  /** [[columnStats]] with HLL NDV (±`rsd` relative error) — the 100 TB
    * variant: no Expand, one ordinary partial→final aggregate. */
  def approxColumnStats(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.05): DataFrame =
    profile(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profile(df: DataFrame, cols: Seq[String],
                      ndv: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "columnStats: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), ndv(c).as(s"__ndv_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_d"), col(s"__max_$c").as("max_d"))
    }
    row.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  /** Pearson correlation of two numeric columns, computed from EXACT
    * decimal power sums (Σx, Σy, Σx², Σy², Σxy at 6dp input precision)
    * with one final double-precision combine — unlike the streaming
    * `corr` aggregate, the result is independent of partitioning and
    * accumulation order, so it hash-compares across engines and cluster
    * sizes. One map-side partial→final aggregate; inputs are quantized to
    * 6 decimal places. */
  def pearson(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,6)")
    val y = col(yCol).cast("decimal(18,6)")
    val nD = col("n").cast("double")
    // filter on the QUANTIZED casts: NaN and |v| >= 1e12 cast to decimal
    // NULL, and a row counted in n whose value the power sums silently
    // skipped yields a plausible-looking but wrong r — such rows must be
    // excluded from n and sums alike
    df.filter(x.isNotNull && y.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      // each exact sum casts to its nearest double ONCE; the combine is
      // then a fixed scalar expression — identical in any engine
      .select(col("n"),
        round((nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double"))
          / sqrt(nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double"))
          / sqrt(nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")), 4)
          .as("r"))
  }

  /** Equi-width histogram of a numeric column: `nBuckets` fixed-width
    * buckets over [min, max], top bucket closed. Two jobs: a 1-row min/max
    * aggregate (the ANALYZE pass), then a map-side bucket assignment +
    * count — no sort, no window, scales with splits. Empty buckets are
    * absent from the output (sparse). */
  def equiWidthHistogram(df: DataFrame, c: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val v = col(c).cast("double")
    val r = df.agg(min(v), max(v)).head()
    require(!r.isNullAt(0), s"equiWidthHistogram($c): no non-null rows")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = (hi - lo) / nBuckets
    val bucket =
      if (width == 0.0) lit(0L)
      else least(floor((v - lit(lo)) / lit(width)), lit((nBuckets - 1).toLong))
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * lit(width), 4).as("lo"),
        round(lit(lo) + (col("bucket") + 1) * lit(width), 4).as("hi"),
        col("cnt"))
  }

  /** Exact interpolated quantiles of a numeric column (the boundaries the
    * reference's equi-depth Histogram stores): (q, value) rows. Spark's
    * exact `percentile` gathers the sorted column per aggregation — fine
    * for ANALYZE-time runs; at 100 TB swap `approx_percentile` in via
    * `exact = false` (t-digest-style sketch, single pass, mergeable). */
  def quantiles(df: DataFrame, c: String, qs: Seq[Double],
                exact: Boolean = true): DataFrame =
    rawQuantiles(df, c, qs, exact)
      .select(col("q"), round(col("value"), 4).as("value"))

  /** [[quantiles]] without display rounding — the form boundary CONSUMERS
    * (equi-depth bucketing) must use, so bucket membership is decided
    * against the true quantile, not a 4-decimal approximation.
    *
    * The exact path is DISTRIBUTED: Spark's `percentile` aggregate
    * buffers every value in one aggregation buffer (the documented 100 TB
    * wall), so instead the column is range-partition sorted (distributed),
    * indexed with `zipWithIndex` (per-partition offsets, one extra count
    * job), and only the ≤ 2·|qs| rows at the quantile positions are
    * collected — driver state is O(|qs|), never O(n). Interpolation
    * reproduces `percentile`/`quantile_cont` semantics exactly:
    * `v[⌊p⌋] + (p−⌊p⌋)·(v[⌈p⌉]−v[⌊p⌋])` at `p = q·(n−1)`
    * (differential-spec-pinned against the SQL aggregate). The rare
    * genuine-RDD use: a global sorted index has no DataFrame form that
    * doesn't funnel through one window partition. */
  private def rawQuantiles(df: DataFrame, c: String, qs: Seq[Double],
                           exact: Boolean): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "qs must be in [0,1]")
    if (exact) {
      val spark = df.sparkSession
      import spark.implicits._
      // drop ONLY nulls — the percentile aggregate keeps NaN (sorted
      // greatest, like Spark's double ordering), and so must this path
      val vals = df.select(col(c).cast("double").as("v"))
        .filter(col("v").isNotNull)
      val n = vals.count()
      if (n == 0L) return qs.map(q => (q, Option.empty[Double])).toDF("q", "value")
      val positions = qs.map(q => q * (n - 1))
      val needed = positions
        .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong)).toSet
      val bc = spark.sparkContext.broadcast(needed)
      val picked = vals.sort("v").rdd.map(_.getDouble(0)).zipWithIndex()
        .filter { case (_, i) => bc.value.contains(i) }
        .map(_.swap).collectAsMap()
      qs.zip(positions).map { case (q, p) =>
        val lo = math.floor(p).toLong
        val v =
          if (p == lo) picked(lo)
          else picked(lo) + (p - lo) * (picked(lo + 1) - picked(lo))
        (q, Some(v))
      }.toDF("q", "value")
    } else {
      // column-API form: interpolating the raw name into SQL text broke
      // (or silently mis-resolved) names needing quoting — the exact path
      // already used col(c)
      val arr = df.agg(
        percentile_approx(col(c).cast("double"),
          array(qs.map(lit): _*), lit(10000)).as("__qs"))
      arr.select(explode(arrays_zip(
          array(qs.map(lit): _*).as("q"),
          expr("transform(__qs, x -> CAST(x AS DOUBLE))").as("value"))).as("s"))
        .select(col("s.q").as("q"), col("s.value").as("value"))
    }
  }

  /** Equi-depth histogram: `nBuckets` buckets holding ~equal row counts,
    * boundaries from [[quantiles]]. The boundary list is tiny and embedded
    * as plan literals, so assignment is map-side (a chain of comparisons in
    * codegen) followed by one count aggregate. */
  def equiDepthHistogram(df: DataFrame, c: String, nBuckets: Int,
                         exact: Boolean = true): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val qs = (0 to nBuckets).map(_.toDouble / nBuckets)
    val boundRows = rawQuantiles(df, c, qs, exact).orderBy("q").collect()
    // zero non-null rows: the approx path yields no boundary rows, the
    // exact path yields null-valued ones — both must hit THIS message,
    // not an NPE inside getDouble
    require(boundRows.length == nBuckets + 1 && boundRows.forall(!_.isNullAt(1)),
      s"equiDepthHistogram($c): no non-null rows")
    val bounds = boundRows.map(_.getDouble(1))
    val v = col(c).cast("double")
    // bucket = number of INNER boundaries strictly below v (top bucket closed)
    val bucket = (1 until nBuckets)
      .map(i => when(v > lit(bounds(i)), 1L).otherwise(0L))
      .foldLeft(lit(0L))(_ + _)
    val counts = df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))
    df.sparkSession.createDataFrame(
        (0 until nBuckets).map(i => (i.toLong, bounds(i), bounds(i + 1))))
      .toDF("bucket", "lo", "hi")
      // counts is post-aggregate (≤ nBuckets rows): broadcastable build side
      .join(broadcast(counts), Seq("bucket"), "left_outer")
      .select(col("bucket"), col("lo"), col("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Feed the stats layer into Catalyst's cost-based optimizer, the way the
    * reference's StatisticsCatalog feeds its CostBasedStage
    * (bundles/sirix-query/.../optimizer/SirixOptimizer.java): run
    * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` with equi-depth
    * histogram collection ON, so `spark.sql.cbo.enabled` (+
    * `spark.sql.cbo.joinReorder.enabled`) estimates filter/join selectivity
    * from per-column NDV, null count, min/max AND histogram buckets — the
    * piece that matters at >12-relation join shapes where AQE's runtime
    * re-plan alone can't fix a bad initial order. ANALYZE is one scan + one
    * aggregate per call (the same shape as [[columnStats]] +
    * [[equiDepthHistogram]]); stats persist in the session catalog until
    * the table's data changes. */
  def analyzeForCbo(spark: SparkSession, table: String, cols: Seq[String],
                    nBuckets: Int = 64): Unit = {
    require(cols.nonEmpty, "analyzeForCbo: no columns given")
    val prevOn = spark.conf.get("spark.sql.statistics.histogram.enabled")
    val prevBins = spark.conf.get("spark.sql.statistics.histogram.numBins")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.numBins", nBuckets.toString)
    try {
      val quoted = cols.map(c => s"`$c`").mkString(", ")
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS $quoted")
      ()
    } finally {
      spark.conf.set("spark.sql.statistics.histogram.enabled", prevOn)
      spark.conf.set("spark.sql.statistics.histogram.numBins", prevBins)
    }
  }
}
