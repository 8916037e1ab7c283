package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.MetaIO

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
    // table root: written through the STANDARD TemporalTable.write path
    // (dictCols + withStats) so the gate numbers measure the shipped
    // write configuration, not a hand-rolled layout; the measured data
    // dir is the revision-1 snapshot. Legacy d<n> dirs (pre-round-7
    // hand-encoded layout) are ignored.
    val root = s"/tmp/graftbench/t$n"
    val dir = s"$root/rev=1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one TemporalTable.write call produces the whole shipped layout:
    // dept/city in the stable dict-surrogate encoding (int32 code columns
    // + footer dictionaries → DictAggRule groups on codes), plus the
    // stats sidecar (count/nulls/sum/min/max + dict-column NDV +
    // per-group sections: dict singles, the dept×city pair, and the
    // age×dept×active cube — 48·8·2 = 768 entries) that makes every one
    // of the nine baseline shapes, filtered ones included, a
    // metadata-only read via AggFromStatsRule. DuckDB's twin reads the
    // same rev=1 parquet files and still groups on the strings.
    val haveEncoded = new java.io.File(s"$dir/_SUCCESS").exists() &&
      spark.read.parquet(dir).columns.contains(graft.operators.Dict.codeCol("dept")) &&
      graft.sources.StatsSidecar.read(dir)
        .exists(st => benchGroups.forall(st.groups.contains))
    if (!haveEncoded) {
      MetaIO.delete(root, recursive = true)
      val base = spark.range(n).repartition(32)
        .select(col("id"),
          (pmod(hash(col("id")), lit(48)) + 18).as("age"),
          concat(lit("dept_"), pmod(hash(col("id") * 7), lit(8))).as("dept"),
          concat(lit("city_"), pmod(hash(col("id") * 13), lit(8))).as("city"),
          (pmod(hash(col("id") * 31), lit(2)) === 0).as("active"))
      graft.sources.TemporalTable.write(base, root,
        withManifest = false, withKeyIndex = false,
        dictCols = Seq("dept", "city"), withStats = true,
        statsGroupCols = benchGroups)
      println(s"generated $n rows via TemporalTable.write (dict dept/city, stats sidecar) at $dir")
    }

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
