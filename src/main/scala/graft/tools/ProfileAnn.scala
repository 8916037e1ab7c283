package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{IvfIndex, Similarity}

/** Measure the ANN kNN-join trade-off: brute-force vs IVF at several
  * nProbe settings — wall time and recall@k on the sf0.1 embeddings.
  * Prints one line per variant. Also growth-checks the insertion graph
  * build: distance evaluations at 10k vs 100k vectors per cell must grow
  * ~linearly (the all-pairs build it replaced grew 100× per decade). */
object ProfileAnn {

  /** Driver-side insertion-build cost meter (no Spark — the kernel is a
    * pure function): seeded synthetic vectors, returns (evals, seconds). */
  private def buildCost(n: Int, dim: Int, m: Int, mL: Int,
                        ef: Int): (Long, Double) = {
    val rnd = new scala.util.Random(42)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val levels = Array.tabulate(n)(i =>
      graft.operators.HnswGraph.levelOf(i.toLong, mL))
    val t0 = System.nanoTime()
    val (_, evals) =
      graft.operators.HnswGraph.insertBuild(vecs, levels, m, ef)
    (evals, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    // graph-build growth: evals per node should be ~flat across a decade
    // (log-factor drift only), nowhere near the 10× of an n² build
    val (e4, t4) = buildCost(10000, 64, m = 8, mL = 16, ef = 64)
    val (e5, t5) = buildCost(100000, 64, m = 8, mL = 16, ef = 64)
    println(f"hnsw build: n=1e4 evals=$e4 (${e4 / 10000.0}%.0f/node) time=$t4%.1fs")
    println(f"hnsw build: n=1e5 evals=$e5 (${e5 / 100000.0}%.0f/node) time=$t5%.1fs")
    println(f"hnsw build growth: per-node eval ratio across the decade = " +
      f"${(e5 / 100000.0) / (e4 / 10000.0)}%.2fx (n2 build would be 10x)")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.df(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val k = 10

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("id_a", "id_b").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // warmup + timed brute force
    Similarity.knnJoin(emb, "vec_id", "embedding", k).write.format("noop").mode("overwrite").save()
    val (bruteRes, bruteSec) = timed {
      neighborSets(Similarity.knnJoin(emb, "vec_id", "embedding", k))
    }
    println(f"brute: n=$n k=$k time=$bruteSec%.2fs (n^2 candidates)")

    val ((model, assignedRaw), fitSec) = timed(IvfIndex.fit(emb, "embedding", nLists = 32))
    val assigned = assignedRaw.cache(); assigned.count()
    println(f"ivf fit: nLists=32 time=$fitSec%.2fs")

    for (nProbe <- Seq(2, 4, 8)) {
      IvfIndex.knnJoin(assigned, model, "vec_id", "embedding", k, nProbe)
        .write.format("noop").mode("overwrite").save()
      val (ivfRes, sec) = timed {
        neighborSets(IvfIndex.knnJoin(assigned, model, "vec_id", "embedding", k, nProbe))
      }
      val recall = bruteRes.keys.toSeq
        .map(id => (ivfRes.getOrElse(id, Set.empty) intersect bruteRes(id)).size.toDouble / k)
        .sum / bruteRes.size
      println(f"ivf: nProbe=$nProbe time=$sec%.2fs recall@$k=$recall%.3f " +
        f"(~${nProbe * 100 / 32}%% of candidates)")
    }
    spark.stop()
  }
}
