package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.10 vector-index row).
  *
  * The reference ships a per-path HNSW vector index with SIMD distance
  * kernels (bundles/sirix-core/src/main/java/io/sirix/index/vector/
  * VectorIndex.java:79, hnsw/HnswGraph.java:24). On Spark the baseline is a
  * brute-force scan — embarrassingly parallel, no shuffle until the final
  * top-k (TakeOrderedAndProject keeps only k rows per partition, so the
  * driver sees #partitions × k rows, not the table). The scale path is
  * LSH bucketing: random-hyperplane signatures (seeded, deterministic)
  * restrict the candidate join to same-bucket rows.
  *
  * Distances are computed with codegen'd higher-order functions
  * (`zip_with` + `aggregate`) in double precision — a sequential left fold,
  * which keeps results deterministic and differential-testable.
  */
object Similarity {

  /** dot(a,b): native codegen'd Catalyst kernel (primitive loop inside
    * whole-stage codegen — [[graft.functions.VectorExpressions]]). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  /** Reference implementation as a sequential higher-order-function fold —
    * bit-identical to the native kernel (same accumulation order); kept for
    * differential testing of the codegen path. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dotHof(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExpressions.cosine(a, b)

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (given as a 1-row
    * DataFrame with column `qvec`, e.g. a looked-up row — broadcast, so the
    * scan side never shuffles). */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(query))
      .withColumn("sim", round(cosine(col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)

  /** Near-duplicate pairs by cosine within an equality-bounded candidate set
    * (`groupCol` keys the shuffle; use an LSH bucket column at scale). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   groupCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(groupCol).as("grp"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(groupCol).as("grp"), col(vecCol).as("vb"))
    a.join(b, "grp").filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Deterministic random-hyperplane LSH bucket id: `nBits` sign bits of
    * projections onto seeded pseudo-random hyperplanes. Rows in the same
    * bucket are ANN candidates; the candidate join shuffles on the bucket
    * id only. Hyperplane components are generated driver-side from a fixed
    * seed and embedded as plan literals — constant-folded, so the per-row
    * work is just `nBits` dot products in codegen (an earlier version
    * derived components from md5 INSIDE the expression, recomputing
    * dim × nBits hashes per row). */
  def lshBucket(vecCol: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { bit =>
      val rnd = new scala.util.Random(1000003L * bit + 17)
      val plane = array(Array.fill(dim)(lit(rnd.nextDouble() - 0.5)): _*)
      val proj = aggregate(
        zip_with(vecCol, plane, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Near-duplicate pairs across the WHOLE table without a label column:
    * candidates are same-LSH-bucket rows (deterministic hyperplanes), so
    * the self-join shuffles on the bucket id and never goes quadratic. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      threshold: Double, nBits: Int = 8): DataFrame =
    nearDupPairs(
      df.withColumn("__bucket", lshBucket(col(vecCol), dim, nBits)),
      idCol, vecCol, "__bucket", threshold)

  /** All-pairs kNN join: for every row, its `k` most-cosine-similar OTHER
    * rows. This is the brute-force correctness baseline: a nested-loop
    * self-join scored with the codegen'd cosine kernel, then a per-probe
    * `row_number` window (each window group is one probe's candidate list;
    * ordering is (rounded sim desc, id) so ranks are deterministic and
    * differential-testable). O(n²) comparisons — use [[IvfIndex.knnJoin]]
    * at scale, which restricts each probe to its nProbe nearest cells. */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    topKPerProbe(
      a.join(b, col("id_a") =!= col("id_b"))
        .withColumn("sim", round(cosine(col("__va"), col("__vb")), 4)), k)
  }

  /** Keep the k best-scored candidates per probe id: shared tail of the
    * brute-force and IVF kNN joins. Expects (id_a, id_b, sim). */
  private[operators] def topKPerProbe(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a").orderBy(desc("sim"), col("id_b"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a"), col("id_b"), col("sim"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the IVF coarse
    * quantizer ([[IvfIndex.fit]], deterministic under the seed), materialize
    * candidate pairs ONLY within a cluster, connect pairs at or above
    * `threshold` cosine similarity into duplicate groups, and keep the
    * smallest id per group. Returns one row per input row:
    * (id, `group_id`, `keep`).
    *
    * The within-cell pair join is what makes semantic dedup tractable at
    * 100 TB: k-means cells bound the candidate set the way LSH bands bound
    * MinHash candidates — no all-pairs comparison ever materializes, and
    * the join shuffles on the cell id, not the vectors, when the
    * assignment is persisted clustered ([[IvfIndex.writeClustered]]).
    * Group assignment reuses the adaptive connected-components fixpoint
    * ([[Graphs.componentLabels]]), so transitive duplicate chains collapse
    * to one survivor (`keep` = the row IS its group's min id). At corpus
    * scale pass `fitFraction` < 1: the k-means fit — the only multi-pass
    * stage — runs on a deterministic hash-sample while cell assignment
    * still covers every row (see [[IvfIndex.fit]]). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    nLists: Int, threshold: Double,
                    seed: Long = 42L, fitFraction: Double = 1.0): DataFrame = {
    val (_, assigned) = IvfIndex.fit(df, vecCol, nLists, seed, fitFraction)
    val pairs = nearDupPairs(assigned, idCol, vecCol, "ivf_cell", threshold)
    Graphs.componentLabels(df, idCol, pairs, "id_a", "id_b")
      .select(col(idCol), col("component").as("group_id"),
        (col("component") === col(idCol)).as("keep"))
  }

  /** [[semanticDedup]] made externally verifiable: the k-means fit (the one
    * stage no SQL oracle can replay) ends at a persisted sidecar — the
    * deterministic cell assignment `(id, ivf_cell)` written to `cellsPath` —
    * and every stage downstream of the sidecar is plain relational algebra
    * computed FROM the re-read sidecar, so an external engine can reproduce
    * the result exactly: join the stored cells to the vectors, pair within
    * cells at `round(cosine, 4) >= threshold`, take connected components,
    * keep the min id per group. */
  def semanticDedupVerified(df: DataFrame, idCol: String, vecCol: String,
                            nLists: Int, threshold: Double, cellsPath: String,
                            seed: Long = 42L, fitFraction: Double = 1.0): DataFrame = {
    val (_, assigned) = IvfIndex.fit(df, vecCol, nLists, seed, fitFraction)
    assigned.select(col(idCol), col("ivf_cell"))
      .write.mode("overwrite").parquet(cellsPath)
    val cells = df.sparkSession.read.parquet(cellsPath)
    val withCells = df.join(cells, idCol)
    val pairs = nearDupPairs(withCells, idCol, vecCol, "ivf_cell", threshold)
    Graphs.componentLabels(df, idCol, pairs, "id_a", "id_b")
      .select(col(idCol), col("component").as("group_id"),
        (col("component") === col(idCol)).as("keep"))
  }

  /** ANN top-k via LSH buckets: probe only the query's bucket. Falls back to
    * brute force within the bucket; recall is tuned by `nBits`. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: DataFrame, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = df.withColumn("bucket", lshBucket(col(vecCol), dim, nBits))
    val q = query.withColumn("qbucket", lshBucket(col("qvec"), dim, nBits))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .withColumn("sim", round(cosine(col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }
}
