package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Before/after evidence for the r17 `_nodekeys` fold (VERDICT r16
  * next-round #4): the offsets sidecar build used to run JsonTreeCounts
  * over every member's raw text TWICE (bucket-totals job + offsets-write
  * job, both re-parsing 1M members); the store's member walk now writes
  * `__nk_n` in its one existing pass, so the lazy build reads two long
  * columns. This tool times the first identity-layout build on a fresh
  * 1M-member store (the fast arm) and, for the BEFORE number, the same
  * two jobs driven by the JsonTreeCounts expression (the exact fallback
  * arm pre-column shreds still take). It also dumps both builds' plans.
  * Lives in `graft.query` for the package-private store internals; run
  * via `sbt "runMain graft.query.ProfileNodekeyBuild [plansOutDir]"`. */
object ProfileNodekeyBuild {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    val members = spark.range(1000000L).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as(Encoders.STRING).collect().mkString(",") + "]"
    val objDoc = "{\"meta\": {\"rev\": 1}, \"items\": " + docJson + "}"
    val st = new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe-nkb").toString)
    st.store("c", "obj.jn", objDoc)
    val entry = st.shredEntries("c", "obj.jn", None)
      .find(_.kind == "json").get
    val full = st.readShredEntry("c", "obj.jn", None, entry)
    require(full.columns.contains("__nk_n"), "store did not write __nk_n")
    val gb = org.apache.spark.sql.graftbridge.GraftBridge

    def buildFrom(counts0: org.apache.spark.sql.DataFrame)
        : (Double, org.apache.spark.sql.DataFrame) = {
      val counts = counts0
        .withColumn("__nk_b", (col("idx") / lit(65536L)).cast("long"))
      val t0 = System.nanoTime()
      val bt = counts.groupBy(col("__nk_b"))
        .agg(sum("__nk_n").as("__bs"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var run = 0L
      val bases = bt.map { case (b, s) => val r = (b, run); run += s; r }
      val baseDf = bases.toSeq.toDF("__nk_b", "__nk_bb")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__nk_b")).orderBy(col("idx"))
      val offs = counts.join(broadcast(baseDf), "__nk_b")
        .withColumn("__nk_off",
          col("__nk_bb") + sum(col("__nk_n")).over(w) - col("__nk_n"))
        .select(col("idx"), col("__nk_n"), col("__nk_off"))
      offs.write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, offs)
    }

    // BEFORE: the counts come from a JsonTreeCounts pass over member_raw
    // (evaluated in BOTH jobs — the r16 shape, unpinned)
    val before = full
      .withColumn("__nk_n", gb.column(JsonTreeCounts(
        gb.expression(col("member_raw")), jsonOnly = true))
        .getField("desc") + lit(1L))
      .select(col("idx"), col("__nk_n"))
    // AFTER: the stored column (2-long-column pruned scan)
    val after = full.select(col("idx"), col("__nk_n"))

    val (tb1, beforePlan) = buildFrom(before)
    val (ta1, afterPlan) = buildFrom(after)
    val (tb2, _) = buildFrom(before)
    val (ta2, _) = buildFrom(after)
    println(f"offsets build BEFORE (JsonTreeCounts x2 jobs): ${math.min(tb1, tb2)}%6.2f s")
    println(f"offsets build AFTER  (stored __nk_n column)  : ${math.min(ta1, ta2)}%6.2f s")

    args.headOption.foreach { outDir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes("UTF-8"))
      dump("nodekey_offsets_build_before.txt", beforePlan)
      dump("nodekey_offsets_build_after.txt", afterPlan)
    }
    spark.stop()
  }
}
