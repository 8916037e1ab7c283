package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Hierarchical NSW — the reference's layered vector graph
  * (bundles/sirix-core/src/main/java/io/sirix/index/vector/hnsw/
  * HnswGraph.java:24) on the [[IvfIndex]] clustered layout, completing
  * the tier above [[NswGraph]]'s flat hub-seeded graph.
  *
  * What the hierarchy buys: entry-point selection in O(m·log n) distance
  * evaluations. The flat graph spends √n hub evaluations to find a good
  * starting basin; at very large per-cell populations (10⁶+ vectors) the
  * layered descent reaches the right basin in ~log_{mL}(n) greedy hops of
  * m evaluations each — the reference's upper-layer routing, re-expressed
  * on the same storage discipline:
  *
  *  - '''levels''' are a pure function of the id (geometric with ratio
  *    1/mL via splitmix64 — deterministic across JVMs and rebuilds, no
  *    stored RNG state; HNSW's `floor(-ln(U)·mL')` with U derived from
  *    the id hash). Level ℓ holds ~n/mL^ℓ nodes.
  *  - '''build''' (one shuffle on the cell id): within each cell, nodes
  *    are INSERTED in id order, each finding its per-layer neighbours by
  *    searching the partially built graph — greedy descent from the
  *    current entry through the layers above the node, then an
  *    `efConstruction`-beam per insertion layer, with the
  *    select-neighbors diversity heuristic choosing the `m` links
  *    (reference hnsw/HnswGraph.java:24's insert loop). Edges are
  *    bidirectional; a neighbour over its cap (`2m` on layer 0, `m`
  *    above) re-prunes with the same heuristic. ~O(n·ef·log n) distance
  *    evaluations per cell — the batch all-pairs build this replaced was
  *    O(n²), which at the 10⁶-vector cells the hierarchy targets meant
  *    ~10¹² evaluations; insertion reaches that regime. Deterministic:
  *    id-order insertion, id tie-breaks everywhere, no RNG. The
  *    per-layer adjacency is stored as an `hnsw_layers:
  *    array<array<long>>` column in the clustered table — the graph
  *    ships with the data, partition pruning applies to both.
  *  - '''search''': probe `nProbe` cells (hive-partition pruning), per
  *    cell descend: start at the cell's top node (max level, ties to the
  *    lowest id — deterministic), greedy step through layers L..1 (move
  *    to the best improving neighbour until none), then a beam of width
  *    `ef` on layer 0 seeded from where the descent landed. Global top-k
  *    of the per-cell beams.
  *
  * The same memory contract as the flat graph: one cell materialized per
  * grouped iterator; size cells via `nLists` so a cell fits an executor.
  */
object HnswGraph {

  /** Cap on the level ladder — 8 layers at mL=16 covers 16⁸ ≈ 4·10⁹
    * nodes per cell, far past the one-cell-fits-an-executor contract. */
  private val MaxLevel = 8

  /** Deterministic geometric level of a node id: P(level ≥ l) = mL^-l.
    * Uses the top 53 hash bits as a uniform in (0,1] — id-stable, so an
    * incremental rebuild assigns every surviving node its old level. */
  private[graft] def levelOf(id: Long, mL: Int): Int = {
    val u = ((NswGraph.splitmix64(id) >>> 11) + 1).toDouble / (1L << 53).toDouble
    math.min(MaxLevel, (-math.log(u) / math.log(mL.toDouble)).toInt)
  }

  // public: Dataset encoder codegen must reach the constructor/accessors
  final case class VecRow(id: Long, vec: Array[Double], cell: Int)
  final case class HnswRow(id: Long, vec: Array[Double], cell: Int,
                           level: Int, layers: Array[Array[Long]])

  /** Per-cell layered adjacency: one shuffle, search-based incremental
    * insertion within each cell (see object scaladoc — ~O(n·ef·log n)
    * distance evaluations, deterministic). Output layout = the clustered
    * table + (`hnsw_level`, `hnsw_layers`). */
  def buildGraph(assigned: DataFrame, idCol: String, vecCol: String,
                 m: Int, mL: Int = 16, efConstruction: Int = 64): DataFrame = {
    require(m >= 1 && mL >= 2, s"need m >= 1, mL >= 2; got m=$m mL=$mL")
    require(efConstruction >= m,
      s"efConstruction ($efConstruction) must be >= m ($m)")
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(
        col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("vec"),
        col("ivf_cell").cast("int").as("cell")).as[VecRow]
      .groupByKey(_.cell)
      .flatMapGroups { (_, rows) =>
        val arr = rows.toArray.sortBy(_.id)
        val levels = arr.map(r => levelOf(r.id, mL))
        val (adj, _) = insertBuild(arr.map(_.vec), levels, m, efConstruction)
        arr.indices.iterator.map { i =>
          HnswRow(arr(i).id, arr(i).vec, arr(i).cell, levels(i),
            adj(i).map(_.map(j => arr(j).id)))
        }
      }
      .toDF(idCol, vecCol, "ivf_cell", "hnsw_level", "hnsw_layers")
  }

  /** Search-based incremental insertion over one cell (the reference's
    * insert loop, hnsw/HnswGraph.java:24): nodes enter in index order
    * (callers pass id-sorted arrays, so index order IS id order); each
    * new node greedy-descends from the current entry point through the
    * layers above its own level, then runs an `efConstruction`-wide beam
    * on each of its insertion layers, links to the [[selectNeighbors]]
    * diversity pick of the beam, and back-links bidirectionally with
    * cap-triggered re-pruning (cap `2m` on layer 0, `m` above — the
    * reference's mMax0/mMax split). Returns (per-node per-layer neighbour
    * INDICES, ascending; total distance evaluations — the build-cost
    * meter ProfileAnn growth-checks). Deterministic: no RNG, ties break
    * on the lower index everywhere. */
  private[graft] def insertBuild(
      vecs: Array[Array[Double]], levels: Array[Int],
      m: Int, efConstruction: Int): (Array[Array[Array[Int]]], Long) = {
    val n = vecs.length
    var evals = 0L
    def sim(a: Int, q: Array[Double]): Double = {
      evals += 1; NswGraph.cosine(vecs(a), q)
    }
    // best-first ordering on (sim desc, index asc)
    val ord: Ordering[(Int, Double)] =
      Ordering.by { case (i, s) => (-s, i) }
    val adj: Array[Array[mutable.ArrayBuffer[Int]]] =
      Array.tabulate(n)(i =>
        Array.fill(levels(i) + 1)(mutable.ArrayBuffer.empty[Int]))

    /** ef-beam over layer `l` of the partial graph, seeded at `eps`
      * (sims already computed); returns the beam best-first. */
    def searchLayer(q: Array[Double], eps: Seq[(Int, Double)], ef: Int,
                    l: Int): Array[(Int, Double)] = {
      val visited = mutable.BitSet.empty
      val candidates = mutable.PriorityQueue.empty[(Int, Double)](ord.reverse)
      val results = mutable.PriorityQueue.empty[(Int, Double)](ord)
      eps.foreach { e =>
        if (!visited.contains(e._1)) {
          visited += e._1
          candidates.enqueue(e)
          results.enqueue(e)
          if (results.size > ef) { results.dequeue(); () }
        }
      }
      while (candidates.nonEmpty) {
        val c = candidates.dequeue()
        if (results.size >= ef && c._2 < results.head._2) candidates.clear()
        else adj(c._1)(l).sorted.foreach { nb =>
          if (!visited.contains(nb)) {
            visited += nb
            val s = sim(nb, q)
            if (results.size < ef || s > results.head._2) {
              candidates.enqueue((nb, s))
              results.enqueue((nb, s))
              if (results.size > ef) { results.dequeue(); () }
            }
          }
        }
      }
      results.dequeueAll.reverseIterator.toArray
    }

    /** Diversity heuristic (reference Algorithm-4 shape): admit a
      * candidate when it is closer to `q` than to every already-admitted
      * neighbour — hub-resistant, keeps links spanning distinct
      * directions; rejected candidates backfill unused slots
      * (keep-pruned, so degree never starves). `cands` best-first. */
    def selectNeighbors(q: Array[Double], cands: Array[(Int, Double)],
                        mSel: Int): mutable.ArrayBuffer[(Int, Double)] = {
      val selected = mutable.ArrayBuffer.empty[(Int, Double)]
      val rejected = mutable.ArrayBuffer.empty[(Int, Double)]
      var i = 0
      while (i < cands.length && selected.size < mSel) {
        val (c, sc) = cands(i)
        if (selected.forall { case (s, _) => sc > sim(c, vecs(s)) })
          selected += ((c, sc))
        else rejected += ((c, sc))
        i += 1
      }
      var j = 0
      while (selected.size < mSel && j < rejected.length) {
        selected += rejected(j); j += 1
      }
      selected
    }

    /** Re-prune a node whose list overflowed its cap: re-run the
      * heuristic around the node's own vector over its current list. */
    def pruneTo(node: Int, l: Int, cap: Int): Unit = {
      val buf = adj(node)(l)
      if (buf.length <= cap) return
      val cands = buf.distinct
        .map(nb => (nb, sim(nb, vecs(node)))).toArray
        .sortBy { case (i2, s) => (-s, i2) }
      val kept = selectNeighbors(vecs(node), cands, cap)
      buf.clear()
      buf ++= kept.map(_._1)
      ()
    }

    var entry = -1
    var i = 0
    while (i < n) {
      val l = levels(i)
      if (entry < 0) entry = i
      else {
        val entryLevel = levels(entry)
        var ep = (entry, sim(entry, vecs(i)))
        // greedy descent through the layers above the node's level
        var lc = entryLevel
        while (lc > l) {
          var improved = true
          while (improved) {
            improved = false
            adj(ep._1)(lc).sorted.foreach { nb =>
              val s = sim(nb, vecs(i))
              if (s > ep._2) { ep = (nb, s); improved = true }
            }
          }
          lc -= 1
        }
        // insertion layers: beam, select, link bidirectionally
        var eps: Seq[(Int, Double)] = Seq(ep)
        var l2 = math.min(entryLevel, l)
        while (l2 >= 0) {
          val beam = searchLayer(vecs(i), eps, efConstruction, l2)
          selectNeighbors(vecs(i), beam, m).foreach { case (j, _) =>
            adj(i)(l2) += j
            adj(j)(l2) += i
            pruneTo(j, l2, if (l2 == 0) 2 * m else m)
          }
          eps = beam.toSeq
          l2 -= 1
        }
        if (l > entryLevel) entry = i
      }
      i += 1
    }
    (adj.map(_.map(_.toArray.sorted)), evals)
  }

  /** Build over an [[IvfIndex.fit]] output and persist clustered by cell
    * (centroid sidecar alongside — [[IvfIndex.writeClustered]]'s layout). */
  def writeGraphIndexed(assigned: DataFrame, model: IvfIndex.Model,
                        idCol: String, vecCol: String, path: String,
                        m: Int = 8, mL: Int = 16,
                        efConstruction: Int = 64): Unit =
    IvfIndex.writeClustered(
      buildGraph(assigned, idCol, vecCol, m, mL, efConstruction),
      model, path)

  /** ANN top-k through the layered descent (see object scaladoc). */
  def searchGraph(spark: SparkSession, path: String, idCol: String,
                  vecCol: String, query: Array[Double],
                  k: Int, nProbe: Int, ef: Int = 32): DataFrame = {
    import spark.implicits._
    val model = IvfIndex.readModel(path)
    val probes = model.nearestCentroids(query, nProbe)
    val hits = spark.read.parquet(path)
      .filter(col("ivf_cell").isin(probes: _*))
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"),
        col("ivf_cell").cast("int"), col("hnsw_level"), col("hnsw_layers"))
      .as[(Long, Array[Double], Int, Int, Array[Array[Long]])]
      .groupByKey(_._3)
      .flatMapGroups { (_, rows) =>
        val graph = rows.map(r => r._1 -> (r._2, r._4, r._5)).toMap
        descendSearch(graph, query, ef)
      }
    hits.toDF(idCol, "sim")
      .withColumn("sim", round(col("sim"), 4))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  private[operators] final case class Hit(id: Long, sim: Double)

  /** One cell: top-entry greedy descent through the upper layers, then an
    * ef-beam on layer 0. A cell too small to have minted any upper-layer
    * node (every level 0) has no routing hierarchy — there the beam
    * seeds from the √n hub sample instead ([[NswGraph]]'s
    * disconnected-basin guard; a single arbitrary entry could be cut off
    * from the query's component of the kNN graph). Deterministic (ties
    * on id everywhere). */
  private[operators] def descendSearch(
      graph: Map[Long, (Array[Double], Int, Array[Array[Long]])],
      query: Array[Double], ef: Int): Iterator[Hit] = {
    if (graph.isEmpty) return Iterator.empty
    def sim(id: Long): Double = NswGraph.cosine(graph(id)._1, query)
    // entry: the cell's top node — max level, ties to lowest id
    var cur = graph.keysIterator.maxBy(id => (graph(id)._2, -id))
    var curSim = sim(cur)
    val topLevel = graph(cur)._2
    if (topLevel == 0) {
      val ids = graph.keysIterator.toArray
      val nHubs = math.max(1, math.ceil(math.sqrt(ids.length.toDouble)).toInt)
      val hubs = ids.sortBy(id => (NswGraph.splitmix64(id), id)).take(nHubs)
      return beamFrom(graph, hubs.map(h => Hit(h, sim(h))), query, ef)
    }
    // greedy descent: layers top..1, move while an improving neighbour exists
    var l = topLevel
    while (l >= 1) {
      var improved = true
      while (improved) {
        improved = false
        val layers = graph(cur)._3
        if (l < layers.length) {
          layers(l).sorted.foreach { n =>
            if (graph.contains(n)) {
              val s = sim(n)
              if (s > curSim) { cur = n; curSim = s; improved = true }
            }
          }
        }
      }
      l -= 1
    }
    // layer-0 beam from the descent's landing point
    beamFrom(graph, Array(Hit(cur, curSim)), query, ef)
  }

  private def beamFrom(
      graph: Map[Long, (Array[Double], Int, Array[Array[Long]])],
      seeds: Array[Hit], query: Array[Double], ef: Int): Iterator[Hit] = {
    def sim(id: Long): Double = NswGraph.cosine(graph(id)._1, query)
    implicit val hitOrd: Ordering[Hit] =
      Ordering.by[Hit, (Double, Long)](h => (-h.sim, h.id))
    val candidates = mutable.PriorityQueue.empty[Hit](hitOrd.reverse)
    val beam = mutable.PriorityQueue.empty[Hit](hitOrd)
    val visited = mutable.Set(seeds.map(_.id).toIndexedSeq: _*)
    seeds.foreach(candidates.enqueue(_))
    while (candidates.nonEmpty) {
      val c = candidates.dequeue()
      if (beam.size >= ef && c.sim <= beam.head.sim) candidates.clear()
      else {
        beam.enqueue(c)
        if (beam.size > ef) beam.dequeue()
        graph(c.id)._3(0).sorted.foreach { n =>
          if (!visited.contains(n) && graph.contains(n)) {
            visited += n
            candidates.enqueue(Hit(n, sim(n)))
          }
        }
      }
    }
    beam.dequeueAll.reverseIterator
  }
}
