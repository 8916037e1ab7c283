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
  *  - '''build''' (one shuffle on the cell id): within each cell, every
  *    node gets, for EACH layer it belongs to, its `m` nearest neighbours
  *    among that layer's members — exact, cell-local. Layer sizes decay
  *    geometrically, so the extra work over the flat single-layer build
  *    is a 1/(1−1/mL²) ≈ +0.4% factor at mL=16. The per-layer adjacency
  *    is stored as an `hnsw_layers: array<array<long>>` column in the
  *    clustered table — the graph ships with the data, partition pruning
  *    applies to both.
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
  private[operators] def levelOf(id: Long, mL: Int): Int = {
    val u = ((NswGraph.splitmix64(id) >>> 11) + 1).toDouble / (1L << 53).toDouble
    math.min(MaxLevel, (-math.log(u) / math.log(mL.toDouble)).toInt)
  }

  // public: Dataset encoder codegen must reach the constructor/accessors
  final case class VecRow(id: Long, vec: Array[Double], cell: Int)
  final case class HnswRow(id: Long, vec: Array[Double], cell: Int,
                           level: Int, layers: Array[Array[Long]])

  /** Per-cell layered adjacency: one shuffle, exact per-layer kNN (the
    * incremental-insert loop of the reference collapsed into one batch —
    * same neighbourhoods, deterministic). Output layout = the clustered
    * table + (`hnsw_level`, `hnsw_layers`). */
  def buildGraph(assigned: DataFrame, idCol: String, vecCol: String,
                 m: Int, mL: Int = 16): DataFrame = {
    require(m >= 1 && mL >= 2, s"need m >= 1, mL >= 2; got m=$m mL=$mL")
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
        // members per layer, geometric decay — layer l reuses the filter
        val byLayer: Array[Array[Int]] =
          (0 to (if (levels.isEmpty) 0 else levels.max)).map(l =>
            arr.indices.filter(i => levels(i) >= l).toArray).toArray
        arr.indices.iterator.map { i =>
          val r = arr(i)
          val layers = (0 to levels(i)).map { l =>
            byLayer(l).iterator
              .filter(_ != i)
              .map(j => (arr(j).id, NswGraph.cosine(r.vec, arr(j).vec)))
              .toArray
              .sortBy { case (id, s) => (-s, id) }
              .take(m).map(_._1)
          }.toArray
          HnswRow(r.id, r.vec, r.cell, levels(i), layers)
        }
      }
      .toDF(idCol, vecCol, "ivf_cell", "hnsw_level", "hnsw_layers")
  }

  /** Build over an [[IvfIndex.fit]] output and persist clustered by cell
    * (centroid sidecar alongside — [[IvfIndex.writeClustered]]'s layout). */
  def writeGraphIndexed(assigned: DataFrame, model: IvfIndex.Model,
                        idCol: String, vecCol: String, path: String,
                        m: Int = 8, mL: Int = 16): Unit =
    IvfIndex.writeClustered(buildGraph(assigned, idCol, vecCol, m, mL),
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
