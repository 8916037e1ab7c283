package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's duck_bench at the reference's own scale: generate the
  * 100M-record dataset shape from docs/COMPARISON_DUCKDB.md:14
  * ({id, age: 18..65, dept: 8, city: 8, active: bool}, uniform) and run
  * the nine analytical shapes. Pass the row count as arg (default 100M).
  * Data lands in /tmp/graftbench/d<n>; a DuckDB twin run over the same
  * parquet gives the local 2x-gate comparison (BENCH_NOTES.md).
  */
object ScaleBench {
  private val benchGroups =
    Seq(Seq("dept", "city"), Seq("age", "dept", "active"))

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val dir = s"/tmp/graftbench/d$n"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the table is written through the dict-surrogate layout (Dict
    // .writeEncoded) — dept/city gain int32 code columns + footer
    // dictionaries. DuckDB's twin reads the same files and still groups on
    // the strings (it aggregates on parquet dictionary codes internally;
    // the layout gives Spark the same move via DictAggRule). Regenerate if
    // an older run left a non-encoded table here.
    val haveEncoded = new java.io.File(s"$dir/_SUCCESS").exists() &&
      spark.read.parquet(dir).columns.contains(graft.operators.Dict.codeCol("dept"))
    if (!haveEncoded) {
      val base = spark.range(n).repartition(32)
        .select(col("id"),
          (pmod(hash(col("id")), lit(48)) + 18).as("age"),
          concat(lit("dept_"), pmod(hash(col("id") * 7), lit(8))).as("dept"),
          concat(lit("city_"), pmod(hash(col("id") * 13), lit(8))).as("city"),
          (pmod(hash(col("id") * 31), lit(2)) === 0).as("active"))
      graft.operators.Dict.writeEncoded(base, Seq("dept", "city"), dir)
      // the stats sidecar (count/nulls/sum/min/max + dict-column NDV +
      // per-group sections: dict singles, the dept×city pair, and the
      // age×dept×active cube — 48·8·2 = 768 entries) makes every one of
      // the nine baseline shapes, filtered ones included, a
      // metadata-only read via AggFromStatsRule
      graft.sources.StatsSidecar.write(spark, dir, groupCols = benchGroups)
      println(s"generated $n rows (dict-encoded dept/city, stats sidecar) at $dir")
    }
    // older runs may predate the sidecar or its group sections
    if (haveEncoded && !graft.sources.StatsSidecar.read(dir)
          .exists(st => benchGroups.forall(st.groups.contains)))
      graft.sources.StatsSidecar.write(spark, dir, groupCols = benchGroups)

    val df = spark.read.parquet(dir)
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "filterCount" -> (() => df.filter(col("age") > 40 && col("active")).agg(count(lit(1)))),
      "groupByDept" -> (() => df.groupBy("dept").agg(count(lit(1)))),
      "sumAge" -> (() => df.agg(sum("age"))),
      "avgAge" -> (() => df.agg(avg("age"))),
      "minMaxAge" -> (() => df.agg(min("age"), max("age"))),
      "groupByDeptCity" -> (() => df.groupBy("dept", "city").agg(count(lit(1)))),
      "filterGroupBy" -> (() => df.filter(col("active")).groupBy("dept").agg(count(lit(1)))),
      "countDistinctDept" -> (() => df.agg(countDistinct(col("dept")))),
      "compoundAnd" -> (() => df.filter(col("age") > 30 && col("age") < 50 && col("active")).agg(count(lit(1)))))

    def run(label: String): Seq[(String, Double)] = shapes.map { case (name, q) =>
      q().write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-7s $name%-20s ${runs.min}%8.1f ms")
      name -> runs.min
    }
    // string-keyed baseline first, then the shipped configuration
    // (Graft.install: DictAggRule + MinMaxFromMetadataRule + count rule):
    // same session, same files
    val noDict = run("plain")
    graft.Graft.install(spark)
    val withDict = run("graft")
    def json(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_bench_ms","rows":$n,"queries":${json(withDict)},"queries_nodict":${json(noDict)}}""")
    spark.stop()
  }
}
