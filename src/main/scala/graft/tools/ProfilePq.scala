package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{HnswGraph, IvfIndex, NswGraph, Pq, Similarity}

/** PQ at scale: 1M synthetic 64-dim vectors — storage footprint of the
  * code-only layout vs raw floats, single-query latency + recall of
  * every ANN tier side by side (brute / IVF-flat / NSW / HNSW / IVF-PQ)
  * at the same nProbe, so the tier-selection guidance in the scaladocs
  * is measured, not asserted. The PQ point being measured: the ADC path
  * reads the (tiny) code+norm columns of the probed cells only, so its
  * cost tracks the CODE bytes, not the vector bytes — the layout that
  * still works when the raw embeddings no longer fit anywhere warm. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    // near-duplicate-groups corpus — the retrieval regime PQ exists for:
    // every 20 consecutive ids share a distinct random direction (tight
    // group, sims ~0.999) and cross-group sims scatter near 0 (random
    // directions in 64-dim), so the true top-k is separated from the rest
    // by a gap far wider than quantization error. (The opposite regime —
    // thousands of near-EQUIDISTANT in-cluster rows whose top-10 differs
    // only at the 4th decimal — defeats any product quantizer by
    // construction: the ADC error band holds thousands of ties; measured
    // and noted in BENCH_NOTES, served by the exact re-rank over IVF
    // instead.)
    val base = spark.range(n.toLong).select(col("id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
        CAST((pmod(xxhash64(CAST(id / 20 AS LONG), j), 2001) - 1000) / 333.0
          + (pmod(xxhash64(id, j), 101) - 50) / 1000.0 AS DOUBLE))""").as("vec"))
      .cache()
    base.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def du(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => du(x.getPath)).sum).getOrElse(0L)
    }

    val root = java.nio.file.Files.createTempDirectory("graft-pqprof").toString
    val (ivfModel, assigned) = IvfIndex.fit(base, "vec", nLists = 64,
      fitFraction = 0.05)
    val pqModel = Pq.fit(base, "vec", dim, m = 8, k = 256,
      fitFraction = 0.02, maxIter = 8)

    // raw clustered layout (floats) vs code-only layout (codes + norm)
    IvfIndex.writeClustered(assigned, ivfModel, s"$root/raw")
    Pq.writeClusteredPq(assigned.select("id", "vec", "ivf_cell"), ivfModel,
      pqModel, "vec", s"$root/pq")
    Pq.encode(assigned, "vec", pqModel)
      .select("id", "pq_codes", "pq_norm", "ivf_cell")
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(s"$root/pqonly")
    println(f"storage: raw=${du(s"$root/raw") / 1e6}%.1f MB " +
      f"pq+vec=${du(s"$root/pq") / 1e6}%.1f MB codes-only=${du(s"$root/pqonly") / 1e6}%.1f MB")

    val q = base.filter(col("id") === 12345L).select("vec").as[Seq[Double]].head().toArray
    val k = 10
    val qdf = Seq(Tuple1(q)).toDF("qvec")
    Similarity.cosineTopK(base, "id", "vec", qdf, k).collect() // warmup
    val (exact, bruteSec) = timed(
      Similarity.cosineTopK(base, "id", "vec", qdf, k).select("id").as[Long].collect().toSet)
    println(f"brute:  $bruteSec%.2fs (scans all $n vectors)")

    IvfIndex.searchClustered(spark, s"$root/raw", "id", "vec", q, k, 4).collect()
    val (ivfHits, ivfSec) = timed(
      IvfIndex.searchClustered(spark, s"$root/raw", "id", "vec", q, k, 4)
        .select("id").as[Long].collect().toSet)
    println(f"ivf:    $ivfSec%.2fs nProbe=4 recall=${(exact & ivfHits).size / 10.0}%.2f " +
      "(probed cells, full float vectors)")

    Pq.searchClusteredPq(spark, s"$root/pq", "id", "vec", q, k, 4, refine = 4).collect()
    val (pqHits, pqSec) = timed(
      Pq.searchClusteredPq(spark, s"$root/pq", "id", "vec", q, k, 4, refine = 4)
        .select("id").as[Long].collect().toSet)
    println(f"ivf-pq: $pqSec%.2fs nProbe=4 refine=4 recall=${(exact & pqHits).size / 10.0}%.2f " +
      "(probed cells, code column + 40 re-ranked vectors)")

    // graph tiers: same clustered layout + stored adjacency — search
    // trades the probed cells' full scan for a beam walk
    val (nswNil, nswBuildSec) = timed(
      NswGraph.writeGraphIndexed(assigned, ivfModel, "id", "vec",
        s"$root/nsw", m = 8))
    NswGraph.searchGraph(spark, s"$root/nsw", "id", "vec", q, k, 4, 48).collect()
    val (nswHits, nswSec) = timed(
      NswGraph.searchGraph(spark, s"$root/nsw", "id", "vec", q, k, 4, ef = 48)
        .select("id").as[Long].collect().toSet)
    println(f"nsw:    $nswSec%.2fs nProbe=4 ef=48 recall=${(exact & nswHits).size / 10.0}%.2f " +
      f"(build ${nswBuildSec}%.1fs — insertion, hub-seeded beam)")

    val (hnswNil, hnswBuildSec) = timed(
      HnswGraph.writeGraphIndexed(assigned, ivfModel, "id", "vec",
        s"$root/hnsw", m = 8, mL = 16))
    HnswGraph.searchGraph(spark, s"$root/hnsw", "id", "vec", q, k, 4, 48).collect()
    val (hnswHits, hnswSec) = timed(
      HnswGraph.searchGraph(spark, s"$root/hnsw", "id", "vec", q, k, 4, ef = 48)
        .select("id").as[Long].collect().toSet)
    println(f"hnsw:   $hnswSec%.2fs nProbe=4 ef=48 recall=${(exact & hnswHits).size / 10.0}%.2f " +
      f"(build ${hnswBuildSec}%.1fs — layered descent)")
    spark.stop()
  }
}
