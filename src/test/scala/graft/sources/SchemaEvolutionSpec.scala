package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Schema evolution across revisions (the reference is schemaless — any
  * revision may shape its documents differently; our relational analog is
  * columns appearing/disappearing between commits). Contract under test:
  * single-revision reads serve each revision's own schema; history reads
  * serve the UNION schema with nulls where a column is absent; diff
  * compares the shared columns; a column retyped across revisions fails
  * loud instead of serving a mixed frame. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft-evol").resolve("tbl").toString

  test("history reads serve the union schema; absent columns read as null") {
    val p = tmp()
    // rev 1: (node_key, v); rev 2 adds w; rev 3 drops v
    TemporalTable.write(Seq((1L, "a"), (2L, "b")).toDF("node_key", "v"), p)
    TemporalTable.write(
      Seq((1L, "a", 10), (3L, "c", 30)).toDF("node_key", "v", "w"), p)
    TemporalTable.write(Seq((1L, 11), (3L, 31)).toDF("node_key", "w"), p)

    // single-revision reads keep each revision's own shape
    assert(TemporalTable.read(spark, p, Some(1)).columns.toSeq ==
      Seq("node_key", "v", "revision", "commit_ts", "author"))
    assert(TemporalTable.read(spark, p, Some(3)).columns.toSeq ==
      Seq("node_key", "w", "revision", "commit_ts", "author"))

    // history: union schema in first-seen order, nulls where absent
    val hist = TemporalTable.readAllRevisions(spark, p)
      .select("revision", "node_key", "v", "w")
    val got = hist.as[(Int, Long, Option[String], Option[Int])]
      .collect().toSet
    assert(got == Set(
      (1, 1L, Some("a"), None), (1, 2L, Some("b"), None),
      (2, 1L, Some("a"), Some(10)), (2, 3L, Some("c"), Some(30)),
      (3, 1L, None, Some(11)), (3, 3L, None, Some(31))), s"got $got")

    // V2 allRevisions: same union frame (plain inference would pick one
    // representative footer and drop the other era's columns)
    val v2 = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
    assert(Set("node_key", "v", "w", "rev").subsetOf(v2.columns.toSet), v2.columns.toSeq)
    assert(v2.filter(col("rev") === 1 && col("w").isNotNull).count() == 0)
    assert(v2.filter(col("rev") === 2).select("node_key", "v", "w")
      .as[(Long, String, Int)].collect().toSet == Set((1L, "a", 10), (3L, "c", 30)))

    // diff across the evolution compares the SHARED columns
    val d12 = TemporalTable.diff(spark, p, 1, 2)
    assert(d12.filter(col("node_key") === 3L)
      .select("change_type").as[String].head() == "insert")
    assert(d12.filter(col("node_key") === 2L)
      .select("change_type").as[String].head() == "delete")
    val d23 = TemporalTable.diff(spark, p, 2, 3)
    assert(d23.filter(col("node_key") === 1L)
      .select("change_type").as[String].head() == "update") // w: 10 → 11
  }

  test("a column retyped across revisions fails loud on the history read") {
    val p = tmp()
    TemporalTable.write(Seq((1L, 5)).toDF("node_key", "v"), p)
    TemporalTable.write(Seq((1L, "five")).toDF("node_key", "v"), p)
    val e = intercept[IllegalArgumentException] {
      TemporalTable.readAllRevisions(spark, p).collect()
    }
    assert(e.getMessage.contains("schema evolution conflict"), e.getMessage)
  }

  test("identical schemas keep the footer-probe path (dict metadata preserved)") {
    val p = tmp()
    // dictionary-surrogate columns carry their dictionaries in column
    // METADATA, which the DDL round-trip drops — equal-schema histories
    // must keep probing a footer so the metadata survives resolution
    TemporalTable.write(Seq((1L, "x")).toDF("node_key", "s"), p,
      dictCols = Seq("s"))
    TemporalTable.write(Seq((1L, "y"), (2L, "x")).toDF("node_key", "s"), p,
      dictCols = Seq("s"))
    val hist = TemporalTable.readAllRevisions(spark, p)
    val dicts = graft.operators.Dict.dictionariesOf(hist.schema)
    assert(dicts.contains("s"),
      s"dictionary metadata lost from the history schema: ${hist.schema}")
    assert(hist.select("s").as[String].collect().toSet == Set("x", "y"))
  }

  test("delta chains evolve at epoch boundaries: schema change forces a full snapshot") {
    val p = tmp()
    def w(df: org.apache.spark.sql.DataFrame) =
      DeltaTemporalTable.write(spark, df, p, snapshotEvery = 4)
    w(Seq((1L, 10.0), (2L, 20.0)).toDF("node_key", "price")) // rev 1: full
    w(Seq((1L, 11.0), (2L, 20.0)).toDF("node_key", "price")) // rev 2: delta
    // rev 3 changes shape mid-epoch → MUST commit as a full snapshot
    w(Seq((1L, 11.0, "eur"), (2L, 20.0, "usd"))
      .toDF("node_key", "price", "ccy"))
    // rev 4: delta within the new epoch
    w(Seq((1L, 12.0, "eur"), (2L, 20.0, "usd"))
      .toDF("node_key", "price", "ccy"))
    assert(DeltaTemporalTable.commits(p).map(_.kind) ==
      Seq("full", "delta", "full", "delta"))

    // per-revision reads serve each epoch's own schema
    assert(DeltaTemporalTable.read(spark, p, Some(2)).columns.toSeq ==
      Seq("node_key", "price"))
    assert(DeltaTemporalTable.read(spark, p, Some(4)).columns.toSeq ==
      Seq("node_key", "price", "ccy"))
    assert(DeltaTemporalTable.read(spark, p, Some(4))
      .filter($"node_key" === 1L).select("price", "ccy")
      .as[(Double, String)].head() == ((12.0, "eur")))

    // history: union frame, epoch-1 rows carry null ccy
    val hist = DeltaTemporalTable.readAllRevisions(spark, p)
      .select("revision", "node_key", "price", "ccy")
      .as[(Int, Long, Double, Option[String])].collect().toSet
    assert(hist == Set(
      (1, 1L, 10.0, None), (1, 2L, 20.0, None),
      (2, 1L, 11.0, None), (2, 2L, 20.0, None),
      (3, 1L, 11.0, Some("eur")), (3, 2L, 20.0, Some("usd")),
      (4, 1L, 12.0, Some("eur")), (4, 2L, 20.0, Some("usd"))), s"got $hist")

    // V2 allRevisions + record lookup + change feed cross the boundary
    val v2 = spark.read.format("graft-temporal")
      .option("allRevisions", true).load(p)
    assert(v2.filter(col("rev") === 1 && col("ccy").isNotNull).count() == 0)
    assert(v2.filter(col("rev") === 4 && col("ccy") === "eur").count() == 1)
    assert(DeltaTemporalTable.recordRevisions(spark, p, 1L)
      .select("revision").as[Int].collect().toSeq == Seq(1, 2, 3, 4))
    val feed = graft.streaming.ChangeFeed.revisionFeed(spark, p)
      .filter(col("revision") === 4 && col("node_key") === 1L)
      .select("change_type").as[String].collect().toSeq
    assert(feed == Seq("update"), s"got $feed")

    // dropping the key column is refused (no later delta could address rows)
    val e = intercept[IllegalArgumentException] {
      w(Seq((1, "x")).toDF("id", "name"))
    }
    assert(e.getMessage.contains("key column"), e.getMessage)
  }

  test("delta feed is replay-start-independent across a dropped-column boundary") {
    val p = tmp()
    DeltaTemporalTable.write(spark,
      Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("node_key", "v", "w"), p,
      snapshotEvery = 4)
    // rev 2 drops w (forced full); v unchanged for key 1, changed for key 2
    DeltaTemporalTable.write(spark,
      Seq((1L, 1.0), (2L, 9.0)).toDF("node_key", "v"), p, snapshotEvery = 4)
    assert(DeltaTemporalTable.commits(p).map(_.kind) == Seq("full", "full"))
    def feedFrom(from: Int) = graft.streaming.ChangeFeed
      .revisionFeed(spark, p, from)
      .filter(col("revision") === 2)
      .select("node_key", "change_type").as[(Long, String)].collect().toSet
    // the same committed revision must produce the same CDC rows whether
    // or not the pre-drop epoch is inside the replay window: key 1's only
    // change is the dropped column (update), key 2's v changed (update)
    assert(feedFrom(1) == Set((1L, "update"), (2L, "update")),
      s"tail replay: ${feedFrom(1)}")
    assert(feedFrom(0).filter(_._2 != "insert") == feedFrom(1),
      s"full replay disagrees: ${feedFrom(0)} vs ${feedFrom(1)}")
  }

  test("evolution through the V2 append path requires the evolveSchema opt-in") {
    val p = tmp()
    TemporalTable.write(Seq((1L, 1.0)).toDF("node_key", "a"), p)
    // default: accidental schema drift fails output resolution loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((9L, 9.0, "no")).toDF("node_key", "a", "b")
        .write.format("graft-temporal").mode("append").save(p)
    }
    // opted in: the revision is written with the query's schema and the
    // commit log records it → history serves the union
    Seq((2L, 2.0, "extra")).toDF("node_key", "a", "b")
      .write.format("graft-temporal").option("evolveSchema", true)
      .mode("append").save(p)
    val hist = TemporalTable.readAllRevisions(spark, p)
      .select("revision", "node_key", "a", "b")
    assert(hist.as[(Int, Long, Double, Option[String])].collect().toSet ==
      Set((1, 1L, 1.0, None), (2, 2L, 2.0, Some("extra"))))
  }
}
