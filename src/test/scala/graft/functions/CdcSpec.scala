package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking: substring/xxhash64 differential, coverage
  * invariants, boundary bounds, and the re-synchronization property that
  * justifies CDC over fixed windows. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def randomText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    // sample whole CODE POINTS (indexing the string by Java char would
    // split the 4-byte emoji into lone surrogates that encode to '?',
    // silently dropping the supplementary-plane coverage)
    val alphabet = Seq("a", "b", "c", "d", "e", "f", "g", "h", " ", "i",
      "j", ".", "k", "λ", "μ", "ν", "中", "文", "字", "😀")
    (1 to n).map(_ => alphabet(r.nextInt(alphabet.size))).mkString
  }

  private lazy val docs = (1 to 40)
    .map(i => (i.toLong, randomText(i, 50 + i * 37)))
    .toDF("doc_id", "text")

  test("chunk offsets slice the text exactly; hash == xxhash64(substring)") {
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text",
      avgBits = 4, minChars = 4, maxChars = 64)
      .join(docs, "doc_id")
      .withColumn("piece", expr("substring(text, start + 1, len)"))
    val bad = chunks.filter(
      col("chunk_hash") =!= xxhash64(col("piece")) ||
        length(col("piece")) =!= col("len"))
    assert(bad.isEmpty, bad.collect().take(3).mkString("\n"))
  }

  test("chunks tile each document: contiguous from 0, lengths within bounds") {
    val minC = 4; val maxC = 64
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text",
      avgBits = 4, minChars = minC, maxChars = maxC)
    // per doc: starts begin at 0, each start = previous start + len,
    // total covered == character length
    val byDoc = chunks.orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start", "len")
      .as[(Long, Int, Int, Int)].collect().groupBy(_._1)
    val lens = docs.select(col("doc_id"), length(col("text")))
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0, s"doc $id first chunk not at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $id gap at ${b._2}")
        case _ =>
      }
      assert(sorted.map(_._4).sum == lens(id), s"doc $id coverage")
      assert(sorted.forall(_._4 <= maxC), s"doc $id chunk over maxChars")
      // every chunk except possibly the last respects minChars
      assert(sorted.dropRight(1).forall(_._4 >= minC), s"doc $id short interior chunk")
    }
  }

  test("editing a prefix re-synchronizes: most chunk hashes survive") {
    val base = randomText(99, 4000)
    val edited = "INSERTED PREAMBLE " + base
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val h = Dedup.cdcChunks(two, "doc_id", "text",
      avgBits = 5, minChars = 8, maxChars = 128)
      .select("doc_id", "chunk_hash").as[(Long, Long)].collect()
    val a = h.filter(_._1 == 1L).map(_._2).toSet
    val b = h.filter(_._1 == 2L).map(_._2).toSet
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared > 0.8,
      f"only $shared%.2f of chunks survived a prefix edit — boundaries not content-defined")
    // the fixed-window strawman would share ~nothing: offsets all shifted
  }

  test("cdcDupRatio scores shared boilerplate without document-level near-dup") {
    val boiler = randomText(7, 600)
    val df = Seq(
      (1L, boiler + randomText(11, 900)),
      (2L, boiler + randomText(12, 900)),
      (3L, randomText(13, 1500))
    ).toDF("doc_id", "text")
    val r = Dedup.cdcDupRatio(df, "doc_id", "text",
      avgBits = 5, minChars = 8, maxChars = 128)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.25 && r(2L) > 0.25,
      s"boilerplate sharers must score: $r")
    assert(r(3L) == 0.0, s"unique doc must score zero: $r")
  }

  test("cdcDupRatioAgainst admits a batch against stored corpus chunks") {
    val boiler = randomText(21, 700)
    val corpus = Seq((1L, boiler + randomText(22, 800)),
      (2L, randomText(23, 900))).toDF("doc_id", "text")
    val stored = java.nio.file.Files.createTempDirectory("cdc-corpus").toString
    Dedup.cdcChunks(corpus, "doc_id", "text", 5, 8, 128)
      .write.mode("overwrite").parquet(stored)
    val batch = Seq(
      (10L, boiler + randomText(31, 500)), // shares the corpus boilerplate
      (11L, randomText(32, 1200))          // entirely new
    ).toDF("doc_id", "text")
    val r = Dedup.cdcDupRatioAgainst(batch, "doc_id", "text", stored,
      avgBits = 5, minChars = 8, maxChars = 128)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(r(10L) > 0.3, s"boilerplate overlap must score: $r")
    assert(r(11L) == 0.0, s"fresh doc must score zero: $r")
  }

  test("SQL registration: graft_cdc_chunks matches the column API") {
    docs.createOrReplaceTempView("cdc_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_cdc_chunks(text, 4, 4, 64) AS cs FROM cdc_docs")
      .selectExpr("doc_id", "cs")
    val viaCol = docs.select(col("doc_id"),
      CdcExpressions.cdcChunks(col("text"), 4, 4, 64).as("cs"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("interpreted eval equals the codegen'd path") {
    val expr = CdcExpressions.CdcChunks(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(col("text")),
      avgBits = 4, minChars = 4, maxChars = 64)
    // run the same frame through a non-codegen projection
    val viaDf = Dedup.cdcChunks(docs, "doc_id", "text", 4, 4, 64)
      .select("doc_id", "chunk_id", "start", "len", "chunk_hash")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    val viaEval = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      val arr = CdcKernel.chunks(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 4, 4, 64)
      (0 until arr.numElements()).map { i =>
        val row = arr.getStruct(i, 3)
        (id, i, row.getInt(0), row.getInt(1), row.getLong(2))
      }
    }.toSet
    assert(viaDf == viaEval)
    assert(expr != null) // anchor the expression type in the spec
  }
}
