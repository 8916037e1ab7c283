package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm point-lookup latency with and without the r17 compiled-plan
  * cache (VERDICT r16 next-round #8): the same serialize() calls run
  * with the cache active (hits re-verify the store fingerprint, then
  * re-execute the Spark plan) and with the cache cleared before every
  * call (the r16 behavior: full parse + compile + Catalyst analysis
  * each time). Run via `sbt "runMain graft.query.ProfilePlanCache"`. */
object ProfilePlanCache {
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
    val st = new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("probe-plancache").toString)
    st.store("c", "obj.jn", objDoc)
    JsoniqRun.serialize(st,
      """let $d := jn:doc('c','obj.jn')
        |let $s := jn:create-cas-index($d, 'xs:double', '/items/[]/w')
        |return {"revision": sdb:commit($d)}""".stripMargin)
    val queries = Seq(
      "static nodekey" -> "sdb:nodekey(jn:doc('c','obj.jn').items[500000].v)",
      "member read" -> "jn:doc('c','obj.jn').items[12].w",
      "scan count" -> ("count(jn:scan-cas-index(jn:doc('c','obj.jn'), 0, " +
        "'0.999', '>', '/items/[]/w'))"))
    queries.foreach { case (label, q) =>
      JsoniqRun.serialize(st, q) // warmup (offsets/skeleton/shred caches)
      def best(n: Int)(body: => Unit): Double =
        (1 to n).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
      val miss = best(5) { st.invalidatePlans(); JsoniqRun.serialize(st, q) }
      val hit = best(5) { JsoniqRun.serialize(st, q) }
      println(f"$label%-16s  cache-miss (r16 path) $miss%6.3f s   " +
        f"cache-hit $hit%6.3f s")
    }
    spark.stop()
  }
}
