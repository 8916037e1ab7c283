package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executed-plan dump for the j_scale_nodekey query shape: where do the
  * exchanges sit in the scan-hits -> nodekey -> distinct pipeline? */
object ProfileNodekeyPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    val members = spark.range(1000000L).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as(Encoders.STRING).collect().mkString(",") + "]"
    val objDoc = "{\"meta\": {\"rev\": 1}, \"items\": " + docJson + "}"
    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe-nkp").toString)
    st.store("c", "obj.jn", objDoc)
    graft.query.JsoniqRun.serialize(st,
      """let $d := jn:doc('c','obj.jn')
        |let $s := jn:create-cas-index($d, 'xs:double', '/items/[]/w')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    val qk = "count(distinct-values(for $n in " +
      "jn:scan-cas-index(jn:doc('c','obj.jn'), 0, '0.99', '>', " +
      "'/items/[]/w') return sdb:nodekey($n)))"
    graft.query.JsoniqRun.serialize(st, qk) // warmup + offsets build
    val df = graft.query.JsoniqRun.run(st, qk)
    val t0 = System.nanoTime()
    df.collect()
    println(f"qk run: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
}
