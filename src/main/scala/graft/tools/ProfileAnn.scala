package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{IvfIndex, Similarity}

/** Measure the ANN kNN-join trade-off: brute-force vs IVF at several
  * nProbe settings — wall time and recall@k on the sf0.1 embeddings.
  * Prints one line per variant. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
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
