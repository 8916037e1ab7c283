package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    Graphs.componentLabels(nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find for differential checks. */
  private def brute(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("chain, triangle, and isolated nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L))
    val nodes = (1L to 4L) ++ Seq(7L, 10L, 11L, 12L)
    val got = labelsOf(edges, nodes)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("long path converges within the iteration budget") {
    // a 64-node path is the adversarial (high-diameter) shape for
    // label propagation; large-star/small-star collapses it in O(log n)
    val edges = (1L until 64L).map(i => (i, i + 1))
    val nodes = (1L to 64L).toSeq
    assert(labelsOf(edges, nodes) == nodes.map(_ -> 1L).toMap)
  }

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 200L).toSeq
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(labelsOf(edges, nodes) == brute(edges, nodes))
  }

  test("distributed star rounds and the driver fast path agree") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter { case (a, b) => a != b }
    val e = edges.toDF("a", "b")
    val driver = Graphs.connectedComponents(e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graphs.connectedComponents(e, "a", "b", driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist && driver.nonEmpty)
  }

  test("string-keyed edges stay on the distributed path and converge") {
    val got = Graphs.connectedComponents(
      Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("empty edge list labels every node itself") {
    val got = labelsOf(Seq.empty, Seq(3L, 5L))
    assert(got == Map(3L -> 3L, 5L -> 5L))
  }

  test("dedupGroups clusters exact and near duplicates transitively") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val docs = Seq(
      (0L, base), (1L, base), // exact dups
      (2L, base + " indeed"), // near dup of 0/1
      (3L, "completely different content about spark connected components at scale"),
      (4L, "zz qq xx 1234567890 nothing shared with anything else in this corpus")
    ).toDF("doc_id", "text")
    val groups = Dedup.dedupGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) == 0L && groups(1L) == 0L && groups(2L) == 0L)
    assert(groups(3L) == 3L && groups(4L) == 4L)
    // dedupCorpus keeps exactly the min-id representative of each group
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L))
  }
}
