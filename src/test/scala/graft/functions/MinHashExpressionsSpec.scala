package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** The reference SQL formulation (the shape the DuckDB oracle mirrors):
    * per-rotation array_min over rotated md5 hex digests of k-shingles. */
  private def sqlSigs(k: Int, n: Int) = expr(
    s"""transform(sequence(0, ${n - 1}), r ->
       |  array_min(transform(sequence(1, length(text) - ${k - 1}), i ->
       |    concat(substring(md5(substring(text, i, $k)), r * 4 + 1, 32 - r * 4),
       |           substring(md5(substring(text, i, $k)), 1, r * 4)))))""".stripMargin)

  private lazy val texts = {
    val rnd = new scala.util.Random(11)
    val alphabets = Seq(
      "abcdefghij ",               // ascii
      "àâçéèêëîïôû ",              // latin-1 supplement (2-byte utf8)
      "αβγδεζηθικλ ",              // greek (2-byte)
      "天地玄黄宇宙洪荒 ",           // cjk (3-byte)
      "a😀b🚀c🌍 ")                // supplementary plane (4-byte)
    (0 until 200).map { i =>
      val alpha = alphabets(i % alphabets.size)
      val len = 5 + rnd.nextInt(60)
      (i.toLong, Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
  }

  test("kernel is bit-identical to the SQL formulation, incl. multi-byte code points") {
    val cmp = texts.filter(length($"text") >= 5).select(
      MinHashExpressions.minHashSigs($"text", 5, 8).as("native"),
      sqlSigs(5, 8).as("sql"))
    assert(cmp.count() > 0)
    assert(cmp.filter($"native" =!= $"sql").count() == 0)
  }

  test("interpreted eval matches codegen") {
    val e = MinHashExpressions.MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal("the quick brown fox"), 5, 8)
    val interpreted = e.eval(null)
    val viaDf = Seq("the quick brown fox").toDF("text")
      .select(MinHashExpressions.minHashSigs($"text", 5, 8)).head().getSeq[String](0)
    assert(interpreted.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq == viaDf)
  }

  test("short and null texts yield null, never a crash") {
    val df = Seq((1L, "abcd"), (2L, null: String), (3L, "abcde"))
      .toDF("doc_id", "text")
      .select($"doc_id", MinHashExpressions.minHashSigs($"text", 5, 8).as("s"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1) && !rows(2).isNullAt(1))
  }
}
