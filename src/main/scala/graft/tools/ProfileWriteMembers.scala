package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase breakdown of [[JsoniqRun.Store.writeMembers]] — the
  * dominant store phase per ProfileStorePhases. Times the sample/schema
  * job, then the member write under ablations (no observe, no typed
  * column, no raw column) to attribute the distributed pass's cost. */
object ProfileWriteMembers {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.Encoders
    val members = spark.range(1000000L).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as(Encoders.STRING).collect().mkString(",") + "]"
    val spans = JsoniqRun.Store.splitTopLevelArraySpans(docJson)
    val ms = JsoniqRun.Store.MemberSpans(docJson, spans)
    val base0 = ms.toDF(spark)
    val dirBase = java.nio.file.Files.createTempDirectory("profile-wm").toString
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    var n = 0
    def dir(): String = { n += 1; s"$dirBase/d$n" }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      timed("normalizeOverflowNumbers (precheck pass)") {
        JsoniqRun.Store.normalizeOverflowNumbers(docJson); ()
      }
      timed("sample collect + schema_of_variant_agg") {
        val step = math.max(1, ms.size / 2048)
        spark.createDataset(
          (0 until ms.size by step).take(4096).map(ms.apply))(Encoders.STRING)
          .toDF("member_json")
          .select(expr("schema_of_variant_agg(try_parse_json(member_json))"))
          .head.getString(0); ()
      }
      val ddl = "STRUCT<v: BIGINT, w: DOUBLE>"
      timed("write: idx + member variant only") {
        base0.select(col("idx"), parse_json(col("member_json")).as("member"))
          .write.mode("overwrite").parquet(dir())
      }
      timed("write: + member_raw") {
        base0.select(col("idx"), parse_json(col("member_json")).as("member"),
          col("member_json").as("member_raw"))
          .write.mode("overwrite").parquet(dir())
      }
      timed("write: + typed t") {
        base0.select(col("idx"), parse_json(col("member_json")).as("member"),
          col("member_json").as("member_raw"),
          parse_json(col("member_json")).try_cast(ddl).as("t"))
          .write.mode("overwrite").parquet(dir())
      }
      timed("write: + observe(schema_of_variant_agg)") {
        val obs = org.apache.spark.sql.Observation()
        base0.select(col("idx"), parse_json(col("member_json")).as("member"),
          col("member_json").as("member_raw"),
          parse_json(col("member_json")).try_cast(ddl).as("t"))
          .observe(obs, expr("schema_of_variant_agg(member)").as("vs"))
          .write.mode("overwrite").parquet(dir())
        obs.get("vs"); ()
      }
      timed("writeMembers (production path)") {
        new JsoniqRun.Store(spark, dirBase).writeMembers(dir(), ms, "json")
      }
    }
    spark.stop()
  }
}
