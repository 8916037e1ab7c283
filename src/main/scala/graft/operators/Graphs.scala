package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering step that turns near-duplicate candidate PAIRS
  * ([[Dedup.minHashCandidatePairs]], [[Similarity.lshNearDupPairs]]) into
  * dedup GROUPS: every document gets the minimum id reachable through the
  * candidate graph, so "keep one per group" is a single filter
  * (`id = group_id`) afterwards.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Both steps are
  * pure relational transforms — a per-center min aggregation joined back to
  * the neighbor list — so each round is two shuffles keyed by node id, with
  * map-side partial aggregation collapsing high-degree centers before the
  * exchange. No collect_list: a hot node (viral boilerplate duplicated
  * across millions of docs) never materializes its neighborhood in one
  * task's memory. Converges in O(log² n) rounds (≤ ~5 in practice for
  * near-dup graphs, whose components are dense and shallow).
  *
  * Each round's output is persisted and its lineage truncated (reliable
  * `checkpoint` when the session has a checkpoint dir — set one on a real
  * cluster — else `localCheckpoint`), so the plan does not deepen with the
  * iteration count.
  */
object Graphs {

  /** One large-star round: every node attaches its LARGER neighbors to the
    * minimum of its neighborhood (including itself). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = nbrs.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    nbrs.join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star round: every node attaches its SMALLER neighbors (and
    * itself) to the minimum of those. Edges are first directed large→small,
    * so each undirected edge is counted at exactly one center. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val mins = dir.groupBy("src").agg(min("dst").as("m"))
    dir.join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(mins.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Truncate lineage between CC rounds so the iterative plan stays flat.
    * Eager, and reliable when a checkpoint dir is configured (edge lists
    * are small; enable `spark.cleaner.referenceTracking.cleanCheckpoints`
    * so round files are reclaimed). */
  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Single-evaluation pin for an expensive subframe shared by several
    * consumers of one batch operator ([[Dedup.minHashCandidatePairs]]'s
    * bands, the corpus aggregates' token tables): LAZY — constructing the
    * operator runs no jobs; the frame materializes with the first action
    * and every consumer reuses the persisted blocks — and always LOCAL,
    * never the reliable checkpoint dir: these intermediates are
    * corpus-scale and transient, and reliable files would accumulate
    * across operator calls (the context cleaner reclaims local blocks
    * when the frame is GC'd; an executor loss costs a job retry, the
    * normal batch contract). */
  private[operators] def pinLocal(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false)

  /** Release a finished round's pinned storage: once the next round is
    * materialized, the previous edge set is never referenced again, so its
    * localCheckpoint blocks come out of executor storage immediately
    * (instead of accumulating for up to `maxIter` rounds). Reliable
    * checkpoint FILES are owned by the context cleaner
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`); unpersist is
    * still correct there — it only drops cached blocks. */
  private[operators] def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Cheap per-round fingerprint of the edge set: (count, xor of row
    * hashes). Order-independent, overflow-free under ANSI mode, and one
    * tiny job; a collision would only stop the loop one round early on a
    * 64-bit-identical edge set — vanishingly unlikely and self-limiting
    * (the result at that point is already a valid partial contraction). */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Connected components of the undirected graph given as an edge list.
    * Returns (`node`, `component`) for every node INCIDENT to an edge;
    * `component` is the minimum node id in the component. Edge endpoints
    * must be orderable (numeric or string).
    *
    * Adaptive execution: when the deduplicated edge list is at most
    * `driverMaxEdges` rows with integral endpoints (≤ ~16 MB of longs —
    * the same bounded-driver-state budget as IvfIndex's k-means
    * centroids), union-find runs on the driver in one collect instead of
    * O(log² n) multi-job star rounds — at sf0.1 this is most of the
    * dedup-group wall clock, pure job-scheduling overhead on a few
    * thousand edges. Above the threshold (the 100 TB regime: candidate
    * edges scale with corpus size) the all-relational loop runs as
    * before; rounds that contract below the threshold finish on the
    * driver too. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          driverMaxEdges: Long = 1000000L): DataFrame = {
    var e = pin(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    var fp = fingerprint(e)
    var converged = false
    var it = 0
    var small: Option[DataFrame] = None
    val integral = e.schema("src").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false // string min is binary-collated in Spark; keep distributed
    }
    while (small.isEmpty && !converged && it < maxIter) {
      if (integral && fp._1 <= driverMaxEdges) {
        small = Some(driverUnionFind(e))
        unpin(e)
      } else {
        val next = pin(smallStar(largeStar(e)))
        val nfp = fingerprint(next) // also forces next's materialization
        converged = nfp == fp
        unpin(e)
        e = next
        fp = nfp
        it += 1
      }
    }
    small.getOrElse {
      // the final mapping is only a component labeling AT THE FIXPOINT —
      // emitting it after an exhausted iteration budget would hand a node
      // on an uncontracted path TWO different component labels, silently
      // breaking the one-row-per-id invariant downstream dedup joins rely
      // on. Star contraction halves path lengths per round, so the
      // default budget covers graphs ~2^25 deep; hitting it means the
      // caller lowered maxIter below the graph's needs — fail loud.
      require(converged,
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (star contraction needs ~log2 of the longest " +
          "path); a non-fixpoint labeling would be silently inconsistent")
      // at the fixpoint every edge points at its component root
      e.select(col("src").as("node"), col("dst").as("component"))
        .union(e.select(col("dst").as("node"), col("dst").as("component")))
        .distinct()
    }
  }

  /** Single-collect union-find (min-root, path-halving) for edge lists
    * under the driver budget. Emits the same (`node`, `component`) frame
    * as the distributed fixpoint, with the input's integral node type. */
  private def driverUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val dt = e.schema("src").dataType
    val longs = e.select(col("src").cast("long"), col("dst").cast("long")).collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    longs.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    import spark.implicits._
    val out = parent.keysIterator.map(n => (n, find(n))).toSeq
    spark.createDataset(out).toDF("node", "component")
      .select(col("node").cast(dt), col("component").cast(dt))
  }

  /** Component labels for ALL nodes of `nodes` (isolated nodes label
    * themselves): (idCol, `component`). */
  def componentLabels(nodes: DataFrame, idCol: String, edges: DataFrame,
                      srcCol: String, dstCol: String,
                      maxIter: Int = 25): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol, maxIter)
    nodes.select(col(idCol))
      .join(cc, col(idCol) === col("node"), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("component"))
  }
}
