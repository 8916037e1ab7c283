package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fresh-JVM probe for the bench's `s_pq_fit` entry (r14 VERDICT Wrong
  * #3: two consecutive elevated in-bench readings, 12.9/15.9 s vs the
  * r13 6.9 s band, code untouched since r10). Same fixture and
  * parameters as [[graft.Bench]]'s entry — min of two timed fits after
  * a warmup, plus a GC-time stamp per run so a collector artifact is
  * visible in the probe itself. One parseable line:
  * `PROBE_PQ_FIT {"fit":s,"gc":s}`. */
object ProbePqFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.Tables.df(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
      .as[Seq[Double]].head().toArray
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.stream()
      .mapToLong(_.getCollectionTime).sum()
    def fitOnce(): Unit = {
      graft.operators.Pq.fit(e, "embedding", dim = q.length, m = 8, k = 16,
        fitFraction = 0.2, maxIter = 8)
      ()
    }
    fitOnce() // warmup
    val runs = (1 to 3).map { i =>
      val g0 = gcMs
      val t0 = System.nanoTime()
      fitOnce()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMs - g0) / 1e3
      println(f"run $i: fit $sec%6.2f s, gc in-run $gc%5.2f s")
      (sec, gc)
    }
    val best = runs.minBy(_._1)
    println(f"""PROBE_PQ_FIT {"fit":${best._1}%.3f,"gc":${best._2}%.3f}""")
    spark.stop()
  }
}
