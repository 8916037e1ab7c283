package graft.query // not graft.tools: probes private[query] Store internals

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the shred store write (round-11: fuse the
  * double distributed parse — inference + typed projection — into one).
  * Compares the r10 shape (spark.read.json inference, then
  * parse_json + from_json write) against the single-parse shape
  * (parse_json once, schema_of_variant_agg on the pinned variants,
  * try_cast to the mapped struct). */
object ProfileShredStore {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }

    val members = spark.range(n.toLong).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as[String].collect().mkString(",") + "]"
    println(f"doc bytes: ${docJson.length / 1e6}%.1f MB ($n members)")

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val split = timed("driver split") {
        JsoniqRun.Store.splitTopLevelArray(docJson)
      }
      val base = timed("parallelize (build frame)") {
        spark.createDataset(spark.sparkContext.parallelize(
            split.zipWithIndex.map { case (m, ix) => (ix.toLong, m) }, 32))
          .toDF("idx", "member_json")
      }
      import org.apache.spark.sql.Encoders
      val sch = timed("r10 inference: spark.read.json") {
        spark.read.json(base.select("member_json").as(Encoders.STRING)).schema
      }
      timed("r10 write: parse_json + from_json") {
        val out = base.select(col("idx"),
          parse_json(col("member_json")).as("member"),
          from_json(col("member_json"), sch).as("t"))
        out.write.mode("overwrite").parquet(
          java.nio.file.Files.createTempDirectory("shredprof").toString + "/a")
      }
      // single-parse shape
      val parsed = timed("v11 parse_json + persist") {
        val p = base.select(col("idx"),
          parse_json(col("member_json")).as("member")).persist()
        p.count()
        p
      }
      val vs = timed("v11 schema_of_variant_agg") {
        parsed.select(expr("schema_of_variant_agg(member)")).head.getString(0)
      }
      println(s"  variant schema: ${vs.take(100)}")
      val ddl = vs.replace("OBJECT<", "STRUCT<")
      timed("v11 write: try_cast(member as struct)") {
        val out = parsed.select(col("idx"), col("member"),
          col("member").try_cast(ddl).as("t"))
        out.write.mode("overwrite").parquet(
          java.nio.file.Files.createTempDirectory("shredprof").toString + "/b")
      }
      parsed.unpersist()
    }
    // the bench shape: full store commits (warm = min of the repeats)
    val st = new JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("shredprof-store").toString)
    (1 to 3).foreach { k =>
      timed(s"st.store full commit #$k") { st.store("c", "big.jn", docJson) }
    }
    // stage isolation of the NEW maybeShred shape
    (1 to 2).foreach { k =>
      println(s"--- v11 stages, round $k ---")
      timed("temporal write (doc row)") {
        import spark.implicits._
        graft.sources.TemporalTable.write(Seq(docJson).toDF("doc_json"),
          java.nio.file.Files.createTempDirectory("sp-t").toString + "/d")
      }
      val split = timed("split") {
        JsoniqRun.Store.splitTopLevelArray(docJson) }
      val base = spark.createDataset(spark.sparkContext.parallelize(
          split.zipWithIndex.map { case (m, ix) => (ix.toLong, m) }, 32))
        .toDF("idx", "member_json")
      val sampleDdl = timed("sample agg") {
        import org.apache.spark.sql.Encoders
        val step = math.max(1, split.size / 2048)
        spark.createDataset(
            split.iterator.grouped(step).map(_.head).take(4096).toSeq)(
            Encoders.STRING)
          .toDF("member_json")
          .select(expr("schema_of_variant_agg(try_parse_json(member_json))"))
          .head.getString(0)
      }
      val ddl = sampleDdl.replace("OBJECT<", "STRUCT<")
        .replaceAll("DECIMAL\\(\\d+,\\s*\\d+\\)", "DOUBLE")
      println(s"  ddl: $ddl")
      val dir = java.nio.file.Files.createTempDirectory("sp-w").toString + "/s"
      timed("write WITHOUT observe, cast t") {
        base.select(col("idx"), parse_json(col("member_json")).as("member"),
            parse_json(col("member_json")).try_cast(ddl).as("t"))
          .write.mode("overwrite").parquet(dir)
      }
      timed("write WITHOUT observe, no t") {
        base.select(col("idx"), parse_json(col("member_json")).as("member"))
          .write.mode("overwrite").parquet(dir)
      }
      timed("write WITH observe, cast t") {
        val obs = org.apache.spark.sql.Observation()
        base.select(col("idx"), parse_json(col("member_json")).as("member"),
            parse_json(col("member_json")).try_cast(ddl).as("t"))
          .observe(obs, expr("schema_of_variant_agg(member)").as("vs"))
          .write.mode("overwrite").parquet(dir)
        println(s"  observed: ${obs.get("vs")}")
      }
    }
    spark.stop()
  }
}
