package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

class NswGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.df(spark, "/root/testdata/sf0.001", "embeddings").cache()

  private def freshPath(): String =
    Files.createTempDirectory("graft-nsw").resolve("idx").toString

  test("writeClustered persists centroids; cell IN-list prunes the file listing") {
    val p = freshPath()
    val (model, assigned) = IvfIndex.fit(emb, "embedding", nLists = 8)
    IvfIndex.writeClustered(assigned, model, p)
    val restored = IvfIndex.readModel(p)
    assert(restored.centroids.length == 8)
    assert(restored.centroids.map(_.toSeq) sameElements model.centroids.map(_.toSeq))
    // a 2-cell probe must touch a strict subset of the data files
    val all = spark.read.parquet(p)
    val totalFiles = all.select(input_file_name()).distinct().count()
    val prunedFiles = all.filter($"ivf_cell".isin(0, 1))
      .select(input_file_name()).distinct().count()
    assert(prunedFiles < totalFiles,
      s"probe read $prunedFiles of $totalFiles files — partition pruning is not firing")
    // searchClustered over the persisted layout = search over the frame
    val query = emb.filter($"vec_id" === 3L)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
      .as[Seq[Double]].head().toArray
    val fromDisk = IvfIndex.searchClustered(spark, p, "vec_id", "embedding",
      query, 5, nProbe = 3).as[(Long, Double)].collect().toSeq
    val fromFrame = IvfIndex.search(assigned, model, "vec_id", "embedding",
      query, 5, nProbe = 3).as[(Long, Double)].collect().toSeq
    assert(fromDisk == fromFrame)
  }

  test("graph search finds the query's own vector and has high recall vs brute force") {
    val p = freshPath()
    val (model, assigned) = IvfIndex.fit(emb, "embedding", nLists = 4)
    NswGraph.writeGraphIndexed(assigned, model, "vec_id", "embedding", p, m = 8)

    val queries = emb.filter($"vec_id" < 5L)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS q")
      .as[(Long, Seq[Double])].collect()
    // the graph layout is writeClustered's + an adjacency column: plain IVF
    // search over it must work with the caller's original column names
    val ivfHits = IvfIndex.searchClustered(spark, p, "vec_id", "embedding",
      queries.head._2.toArray, 5, nProbe = 4)
    assert(ivfHits.count() == 5)
    val recalls = queries.map { case (qid, q) =>
      val approx = NswGraph.searchGraph(spark, p, "vec_id", "embedding",
          q.toArray, 10, nProbe = 4, ef = 48)
        .as[(Long, Double)].collect()
      // all cells probed + the query's own vector present → it must rank first
      assert(approx.head._1 == qid && approx.head._2 == 1.0,
        s"query $qid did not find itself: ${approx.take(3).toSeq}")
      val truth = Similarity.cosineTopK(emb, "vec_id", "embedding",
        spark.range(1).select(lit(q.toArray).as("qvec")), 10)
        .as[(Long, Double)].collect().map(_._1).toSet
      (approx.map(_._1).toSet intersect truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.85, s"mean recall@10 too low: $mean")
  }

  test("hub seeding reaches a basin disconnected from the min-id entry") {
    // two tight clusters far apart: the in-cell kNN graph (m=3) splits
    // into two components, so any single fixed entry point can only ever
    // reach its own component — the √n hub sample must span both
    def cluster(base: Double, ids: Range): Map[Long, Array[Double]] =
      ids.map(i => i.toLong -> Array(base + (i % 7) * 1e-3, 1.0)).toMap
    val vecs = cluster(10.0, 0 until 40) ++ cluster(-10.0, 40 until 80)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val graph = vecs.map { case (id, v) =>
      val nn = vecs.keys.filter(_ != id).toSeq
        .sortBy(o => (-cos(vecs(o), v), o)).take(3)
      id -> (v, nn.toArray)
    }
    // a query sitting on the SECOND cluster (ids 40+, far from min id 0)
    val q = Array(-10.0, 1.0)
    val hits = NswGraph.beamSearch(graph, q, ef = 8).toSeq
    assert(hits.nonEmpty && hits.head.id >= 40L,
      s"beam never escaped the min-id component: ${hits.take(3)}")
  }

  test("beam search is deterministic and bounded by ef") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i => i -> Array.fill(8)(rnd.nextDouble() - 0.5)).toMap
    val graph = vecs.map { case (id, v) =>
      val nn = vecs.keys.filter(_ != id).toSeq
        .sortBy(o => -vecs(o).zip(v).map { case (x, y) => x * y }.sum).take(6)
      id -> (v, nn.toArray)
    }
    val q = Array.fill(8)(0.1)
    val r1 = NswGraph.beamSearch(graph, q, ef = 10).toSeq
    val r2 = NswGraph.beamSearch(graph, q, ef = 10).toSeq
    assert(r1 == r2)
    assert(r1.size <= 10)
    // sims are non-increasing
    assert(r1.sliding(2).forall {
      case Seq(a, b) => a.sim >= b.sim
      case _ => true
    })
  }
}
