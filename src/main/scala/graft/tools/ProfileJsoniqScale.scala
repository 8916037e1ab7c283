package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Front-end scale check: the same aggregation over 1M records, (a) as a
  * JSONiq query over a stored 1M-member array document, (b) as the
  * direct DataFrame plan over parquet. Measures what the thin-translator
  * claim is worth: the FLWOR compiles to the same explode/filter/agg
  * shape, but a single-document store serves the whole array as ONE
  * variant row, so the member explode runs in one task before
  * distribution kicks in — the honest posture note for BENCH_NOTES (the
  * scale path for corpora is the shredded/parquet table, not one giant
  * document). */
object ProfileJsoniqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // one document: [{"v": i, "w": hash-noise}, ...] x n
    val members = spark.range(n.toLong).select(col("id").as("v"),
      (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
    val pq = java.nio.file.Files.createTempDirectory("jqscale").toString
    members.write.mode("overwrite").parquet(s"$pq/members")

    val docJson = "[" + members.orderBy("v")
      .select(to_json(struct(col("v"), col("w"))))
      .as[String].collect().mkString(",") + "]"
    println(f"doc bytes: ${docJson.length / 1e6}%.1f MB ($n members)")

    val st = new graft.query.JsoniqRun.Store(spark,
      java.nio.file.Files.createTempDirectory("jqscale-store").toString)
    val (_, storeSec) = timed(st.store("c", "big.jn", docJson))
    println(f"store (1 revision commit): $storeSec%.1fs")

    val q = """count(jn:doc('c','big.jn')[][?$$.w gt 0.9])"""
    graft.query.JsoniqRun.serialize(st, q) // warmup
    val (cnt, qSec) = timed(graft.query.JsoniqRun.serialize(st, q))
    println(f"jsoniq  filter+count: $cnt ($qSec%.1fs)")

    val (_, fixedSec) = timed(graft.query.JsoniqRun.serialize(st, "1 + 1"))
    println(f"jsoniq  fixed overhead (1+1): $fixedSec%.1fs")

    // the FLWOR authoring shape: for + where fuses into the typed scan
    val qf = """count(for $m in jn:doc('c','big.jn') where $m.w gt 0.9 return $m)"""
    graft.query.JsoniqRun.serialize(st, qf) // warmup
    val (cntF, fSec) = timed(graft.query.JsoniqRun.serialize(st, qf))
    println(f"jsoniq  for+where count: $cntF ($fSec%.1fs)")
    require(cntF == cnt, s"for+where disagrees: $cntF vs $cnt")

    // decomposition: hand-built equivalents over the shred table
    val shredDir = s"${st.baseDir}/c/big.jn/_shred/r1/s0"
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(shredDir))) {
      val sh = spark.read.parquet(shredDir)
      val (c0, s0) = timed(sh.count().toString)
      println(f"shred   raw count:      $c0 ($s0%.1fs)")
      val (c1, s1) = timed(sh
        .filter(variant_get(col("member"), "$.w", "double") > 0.9)
        .count().toString)
      println(f"shred   variant filter: $c1 ($s1%.1fs)")
      if (sh.columns.contains("t")) {
        val (c2, s2) = timed(
          sh.filter(col("t.w") > 0.9).count().toString)
        println(f"shred   typed filter:   $c2 ($s2%.1fs)")
      }
    }
    // arithmetic-where (round 11): compiles onto the typed column in
    // double — must match the plain [?pred] time, not the variant path
    val qa = """count(jn:doc('c','big.jn')[][?$$.w * 2 gt 1.8])"""
    graft.query.JsoniqRun.serialize(st, qa) // warmup
    val (cntA, aSec) = timed(graft.query.JsoniqRun.serialize(st, qa))
    println(f"jsoniq  arith-where count: $cntA ($aSec%.1fs)")
    require(cntA == cnt, s"arith-where disagrees: $cntA vs $cnt")

    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      graft.query.JsoniqRun.run(st, q).explain("formatted")
    }

    val direct = spark.read.parquet(s"$pq/members")
    val (cnt2, dSec) = timed(
      direct.filter(col("w") > 0.9).count().toString)
    println(f"direct  filter+count: $cnt2 ($dSec%.1fs)")
    require(cnt == cnt2, s"front end disagrees: $cnt vs $cnt2")
    spark.stop()
  }
}
