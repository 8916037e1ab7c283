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

  // array shape: { id, items: array<struct{v, sub: array<struct{v}>}>, tail: struct{v} }
  private lazy val arrDocs = Seq(
    (1L, Seq((1.0, Seq(2.0, 3.0)), (4.0, Seq.empty[Double])), 9.0),
    (2L, Seq.empty[(Double, Seq[Double])], 8.0))
    .toDF("id", "raw", "tv")
    .select($"id",
      transform($"raw", r => struct(r.getField("_1").as("v"),
        transform(r.getField("_2"), s => struct(s.as("v"))).as("sub"))).as("items"),
      struct($"tv".as("v")).as("tail"))

  test("derefDescendant searches inside arrays (first match, doc order)") {
    val r = arrDocs.select($"id", Nested.derefDescendant(arrDocs, "v").as("v"))
      .as[(Long, Double)].collect().toMap
    // id=1: items[0].v = 1.0 precedes everything; id=2: items empty → tail.v
    assert(r == Map(1L -> 1.0, 2L -> 8.0))
  }

  test("derefDescendantAll flattens array-borne matches in document order") {
    val r = arrDocs.select($"id", Nested.derefDescendantAll(arrDocs, "v").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    // TRUE document order: items[0].v, items[0].sub[*].v, items[1].v, tail.v
    assert(r == Map(1L -> Seq(1.0, 2.0, 3.0, 4.0, 9.0), 2L -> Seq(8.0)))
  }

  test("struct-only dotted paths exclude array-crossing branches") {
    assert(Nested.descendantPaths(arrDocs.schema, "v") == Seq("tail.v"))
  }

  test("null arrays contribute no matches instead of nulling the result") {
    // items is NULL (not empty) — tail.v must still surface
    val withNull = Seq((9L, 7.5)).toDF("id", "tv")
      .select($"id",
        lit(null).cast(arrDocs.schema("items").dataType).as("items"),
        struct($"tv".as("v")).as("tail"))
    val all = withNull.select(Nested.derefDescendantAll(withNull, "v").as("v"))
      .as[Seq[Double]].head()
    assert(all == Seq(7.5), s"null array must be skipped, got $all")
    val first = withNull.select(Nested.derefDescendant(withNull, "v").as("v"))
      .as[Double].head()
    assert(first == 7.5)
  }

  test("toJsonLimited truncates nesting at maxLevel") {
    val l1 = docs.filter($"id" === 1L)
      .select(Nested.toJsonLimited(docs, "a", 1).as("js")).as[String].head()
    assert(l1 == """{"price":10.0}""") // meta (level 2) dropped
    val l2 = docs.filter($"id" === 1L)
      .select(Nested.toJsonLimited(docs, "a", 2).as("js")).as[String].head()
    assert(l2 == """{"price":10.0,"meta":{"price":11.0,"tag":"x"}}""")
  }

  test("maxLevel reaches structs INSIDE arrays (no depth bypass)") {
    // struct<items: array<struct<a: struct<b>>>> — the array previously
    // escaped truncateToLevel entirely, serializing unbounded depth
    val d = Seq((1L, Seq((5L, 7L)))).toDF("id", "raw")
      .select($"id", struct(
        expr("transform(raw, r -> struct(struct(r._1 AS b) AS a, r._2 AS n))")
          .as("items")).as("doc"))
    // level 2: doc.items[].{a?, n} — a is a struct at level 3 → dropped
    val l2 = d.select(Nested.toJsonLimited(d, "doc", 2).as("js")).as[String].head()
    assert(l2 == """{"items":[{"n":7}]}""", s"got $l2")
    // level 3 keeps the full subtree
    val l3 = d.select(Nested.toJsonLimited(d, "doc", 3).as("js")).as[String].head()
    assert(l3 == """{"items":[{"a":{"b":5},"n":7}]}""", s"got $l3")
    // level 1: the array's element struct is beyond the limit → array drops
    val l1 = d.select(Nested.toJsonLimited(d, "doc", 1).as("js")).as[String].head()
    assert(l1 == "{}", s"got $l1")
  }

  test("field names containing dots resolve exactly, never as nested access") {
    val d = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L,
        org.apache.spark.sql.Row(42, org.apache.spark.sql.Row(7)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a.b",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("c",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("v",
                  org.apache.spark.sql.types.IntegerType))))))))))
    // first match of v lives under the dotted-name column `a.b`
    assert(d.select(Nested.derefDescendant(d, "v").as("m"))
      .as[Int].head() == 42)
    assert(d.select(Nested.derefDescendantAll(d, "v").as("m"))
      .as[Seq[Int]].head() == Seq(42, 7))
  }

  test("quantize: null elements and unbounded dimensions keep NULL slots") {
    val bounds = Quantize.fitBounds(
      Seq((1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 10.0))).toDF("id", "v"), "v")
    // a null element must NOT fabricate code 0 (the dimension minimum)
    val withNull = Seq((1L, Seq[java.lang.Double](null, 5.0))).toDF("id", "v")
    val codes = Quantize.encode(withNull, "id", "v", bounds)
      .select("codes").as[Seq[Option[Long]]].head()
    assert(codes == Seq(None, Some(128L)), s"got $codes")
    // a vector longer than the fitted bounds keeps null tail slots,
    // never a silently shortened array
    val longer = Seq((1L, Seq(5.0, 5.0, 5.0))).toDF("id", "v")
    val c2 = Quantize.encode(longer, "id", "v", bounds)
      .select("codes").as[Seq[Option[Long]]].head()
    assert(c2 == Seq(Some(128L), Some(128L), None), s"got $c2")
  }

  test("toJsonLimited caps arrays at maxChildren, at every depth") {
    val d = Seq((1L, Seq(1L, 2L, 3L, 4L), Seq(Seq(10L, 20L, 30L), Seq(40L))))
      .toDF("id", "xs", "yss")
      .select($"id", struct($"xs", $"yss").as("doc"))
    val js = d.select(Nested.toJsonLimited(d, "doc", 9, 2).as("js"))
      .as[String].head()
    // outer arrays sliced to 2; the nested inner array sliced too
    assert(js == """{"xs":[1,2],"yss":[[10,20],[40]]}""")
    // short arrays pass through untouched
    val js1 = d.select(Nested.toJsonLimited(d, "doc", 9, 5).as("js"))
      .as[String].head()
    assert(js1 == """{"xs":[1,2,3,4],"yss":[[10,20,30],[40]]}""")
  }
}
