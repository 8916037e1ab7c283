package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NestedSpec extends SparkSpec {
  import spark.implicits._

  // document shape: { id, a: { price, meta: { price, tag } }, b: { deep: { price } } }
  private lazy val docs = Seq((1L, 10.0, 11.0, "x", 12.0), (2L, 20.0, 21.0, "y", 22.0))
    .toDF("id", "p1", "p2", "tag", "p3")
    .select($"id",
      struct($"p1".as("price"), struct($"p2".as("price"), $"tag".as("tag")).as("meta")).as("a"),
      struct(struct($"p3".as("price")).as("deep")).as("b"))

  test("descendantPaths enumerates document-order paths, first-match-per-branch") {
    val paths = Nested.descendantPaths(docs.schema, "price")
    // a.price and a.meta.price are sibling branches — both match; a match
    // terminates only its OWN branch's descent (first-match-per-branch)
    assert(paths == Seq("a.price", "a.meta.price", "b.deep.price"))
    assert(Nested.descendantPaths(docs.schema, "tag") == Seq("a.meta.tag"))
    assert(Nested.descendantPaths(docs.schema, "absent").isEmpty)
  }

  test("derefDescendant returns first match; missing field yields null") {
    val r = docs.select($"id", Nested.derefDescendant(docs, "price").as("v"))
      .as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 10.0, 2L -> 20.0))
    val none = docs.select(Nested.derefDescendant(docs, "absent").as("v"))
      .filter($"v".isNull).count()
    assert(none == 2)
  }

  test("derefDescendantAll collects all branch matches in document order") {
    val r = docs.select($"id", Nested.derefDescendantAll(docs, "price").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(r == Map(1L -> Seq(10.0, 11.0, 12.0), 2L -> Seq(20.0, 21.0, 22.0)))
  }

  test("toJsonLimited truncates nesting at maxLevel") {
    val l1 = docs.filter($"id" === 1L)
      .select(Nested.toJsonLimited(docs, "a", 1).as("js")).as[String].head()
    assert(l1 == """{"price":10.0}""") // meta (level 2) dropped
    val l2 = docs.filter($"id" === 1L)
      .select(Nested.toJsonLimited(docs, "a", 2).as("js")).as[String].head()
    assert(l2 == """{"price":10.0,"meta":{"price":11.0,"tag":"x"}}""")
  }
}
