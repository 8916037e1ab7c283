package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import JsonUpdates._

class JsonUpdatesSpec extends SparkSpec {
  import spark.implicits._

  private def doc() = Seq((1L, "a", 10.0, Seq((1L, 2.0), (2L, 3.0))))
    .toDF("id", "s", "v", "raw")
    .select(col("id"),
      struct(col("s"),
        struct(col("v").as("x")).as("inner"),
        transform(col("raw"),
          e => struct(e.getField("_1").as("k"), e.getField("_2").as("q")))
          .as("items")).as("doc"))

  test("insertField adds nested fields; replaceValue overwrites") {
    val d = doc()
      .withColumn("doc", insertField(col("doc"), "inner.y", lit(7)))
      .withColumn("doc", replaceValue(col("doc"), "inner.x", lit(99.0)))
    assert(d.select("doc.inner.y", "doc.inner.x").as[(Int, Double)].head() == (7, 99.0))
  }

  test("removeField deletes; renameField keeps the value under the new key") {
    val d = doc()
      .withColumn("doc", renameField(col("doc"), "inner.x", "z"))
      .withColumn("doc", removeField(col("doc"), "s"))
    assert(d.select("doc.inner.z").as[Double].head() == 10.0)
    assert(!d.select("doc.*").columns.contains("s"))
    assert(!d.select("doc.inner.*").columns.contains("x"))
  }

  test("[] segments rewrite every array element in place (no explode)") {
    val d = doc()
      .withColumn("doc", mapField(col("doc"), "items[].q")(
        p => p.getField("q") * 10))
      .withColumn("doc", insertField(col("doc"), "items[].tag", lit("t")))
    assert(d.select("doc.items").as[Seq[(Long, Double, String)]].head() ==
      Seq((1L, 20.0, "t"), (2L, 30.0, "t")))
    // the rewrite is a pure projection: no generator, no join, no exchange
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("Exchange"))
  }

  test("appendToArray pushes an element (insertSubtreeAsLastChild analog)") {
    val d = doc().withColumn("doc",
      appendToArray(col("doc"), "items", struct(lit(9L).as("k"), lit(0.0).as("q"))))
    assert(d.select(size(col("doc.items"))).as[Int].head() == 3)
    val last = element_at(col("doc.items"), 3)
    assert(d.select(last.getField("k"), last.getField("q"))
      .as[(Long, Double)].head() == (9L, 0.0))
  }

  test("edits compose and leave untouched siblings intact") {
    val d = doc()
      .withColumn("doc", insertField(col("doc"), "inner.y", lit(1)))
      .withColumn("doc", renameField(col("doc"), "inner.y", "w"))
      .withColumn("doc", removeField(col("doc"), "inner.w"))
    // net effect: unchanged inner struct
    assert(d.select("doc.inner.x").as[Double].head() == 10.0)
    assert(d.select("doc.s").as[String].head() == "a")
  }

  test("terminal [] segment is rejected") {
    intercept[IllegalArgumentException] {
      insertField(col("doc"), "items[]", lit(1))
    }
  }
}
