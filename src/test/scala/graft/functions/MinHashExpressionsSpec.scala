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

  test("simhash kernel is bit-identical to the exploded aggregate formulation") {
    val docs = texts.filter(length(trim($"text")) > 0)
    val native = docs.select($"doc_id",
        MinHashExpressions.simHash32($"text").as("simhash"))
      .filter($"simhash".isNotNull)
    // the original two-aggregation shape, verbatim
    val toks = docs.select($"doc_id",
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
    val agg = toks
      .select($"doc_id", $"tok", explode(expr("sequence(0, 31)")).as("i"))
      .withColumn("bit",
        expr("shiftright(instr('0123456789abcdef', substring(md5(tok), (i div 4) + 1, 1)) - 1, i % 4) & 1"))
      .groupBy($"doc_id", $"i")
      .agg(sum($"bit" * 2 - 1).as("w"))
      .groupBy($"doc_id")
      .agg(sum(expr("CASE WHEN w > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
    val n = native.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val a = agg.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(n == a)
    assert(n.nonEmpty)
  }

  test("simhash: all-space and empty texts drop like the exploded formulation") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one token")).toDF("doc_id", "text")
      .select($"doc_id", MinHashExpressions.simHash32($"text").as("s"))
      .filter($"s".isNotNull)
    assert(df.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("winnowing kernel equals the window-min formulation as a set") {
    val docs = texts.filter(length($"text") >= 5)
    val native = docs.select($"doc_id",
        explode(MinHashExpressions.winnowingPrints($"text", 5, 4)).as("fp"))
      .as[(Long, String)].collect().toSet
    // the original explode + forward-window min + distinct, verbatim
    val hashed = docs.select($"doc_id",
        posexplode(expr("transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))")))
      .select($"doc_id", $"pos", md5($"col").as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    val agg = hashed.withColumn("fp", min($"h").over(win))
      .select($"doc_id", $"fp").distinct()
      .as[(Long, String)].collect().toSet
    assert(native == agg)
    assert(native.nonEmpty)
    // per-doc prints are already distinct (no downstream distinct needed)
    val perDoc = docs.select($"doc_id",
      MinHashExpressions.winnowingPrints($"text", 5, 4).as("fps"))
      .as[(Long, Seq[String])].collect()
    perDoc.foreach { case (id, fps) =>
      assert(fps.distinct.length == fps.length, s"doc $id has repeated prints") }
  }

  test("repetitionStats kernel equals the aggregate/window formulation") {
    val docs = texts.unionByName(Seq(
      (900L, ""), (901L, "   "), (902L, "solo"),
      (903L, "tie tie bee bee"),          // count tie -> smallest word
      (904L, "a a a b b")).toDF("doc_id", "text"))
    val native = docs.select($"doc_id",
        MinHashExpressions.repetitionStats($"text").as("r"))
      .select($"doc_id", $"r.n_words", $"r.top_word", $"r.top_cnt",
        $"r.n_distinct_2grams")
      .as[(Long, Option[Long], Option[String], Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._1)
    // the original shapes, verbatim
    val tokens = docs.select($"doc_id",
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
    val wordCounts = tokens.groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
    val topWord = wordCounts
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy(desc("cnt"), $"w")))
      .filter($"rn" === 1).select($"doc_id", $"w", $"cnt")
    val nWords = wordCounts.groupBy($"doc_id").agg(sum($"cnt").as("n_words"))
    // explode_outer: a doc with words but no 2-gram still groups, with
    // count_distinct(null) = 0 — the kernel's convention (the final
    // repetitionMetrics output is identical either way: the n_words >= 2
    // guard nulls the fraction)
    val grams = docs.select($"doc_id", explode_outer(expr(
        """CASE WHEN size(filter(split(text, ' '), x -> x != '')) >= 2
          |THEN transform(sequence(0, size(filter(split(text, ' '), x -> x != '')) - 2),
          |  i -> concat_ws(' ', slice(filter(split(text, ' '), x -> x != ''), i + 1, 2)))
          |ELSE array() END""".stripMargin)).as("g"))
      .groupBy($"doc_id").agg(count_distinct($"g").as("nd"))
      .join(nWords.select($"doc_id"), Seq("doc_id"), "left_semi")
    val expected = docs.select($"doc_id")
      .join(nWords, Seq("doc_id"), "left")
      .join(topWord, Seq("doc_id"), "left")
      .join(grams, Seq("doc_id"), "left")
      .as[(Long, Option[Long], Option[String], Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._1)
    assert(native == expected)
    // null-struct docs surface as all-null fields
    val m = native.map(r => r._1 -> r).toMap
    assert(m(900L)._2.isEmpty && m(901L)._2.isEmpty)
    assert(m(902L) == ((902L, Some(1L), Some("solo"), Some(1L), Some(0L))))
    assert(m(903L)._3 == Some("bee"), "count tie must pick the smallest word")
  }

  test("wordGramHashes equals md5 over the array_join n-gram formulation") {
    val docs = texts
    val ngramSql = expr(
      """CASE WHEN size(filter(split(text, ' '), x -> x != '')) >= 3
        |THEN transform(sequence(0, size(filter(split(text, ' '), x -> x != '')) - 3),
        |  i -> md5(array_join(slice(filter(split(text, ' '), x -> x != ''), i + 1, 3), ' ')))
        |ELSE array() END""".stripMargin)
    val expected = docs.select($"doc_id", posexplode(ngramSql))
      .select($"doc_id", $"pos", $"col").as[(Long, Int, String)].collect().toSet
    val native = docs.select($"doc_id",
        posexplode(MinHashExpressions.wordGramHashes($"text", 3)).as(Seq("pos", "h")))
      .as[(Long, Int, String)].collect().toSet
    assert(native == expected)
    assert(native.nonEmpty)
    // dedup variant: first-occurrence distinct per doc
    val dedup = docs.select($"doc_id",
        explode(MinHashExpressions.wordGramHashes($"text", 3, dedup = true)).as("h"))
      .as[(Long, String)].collect()
    assert(dedup.toSet == expected.map(r => (r._1, r._3)))
    assert(dedup.groupBy(identity).values.forall(_.length == 1),
      "dedup variant must emit each (doc, hash) once")
  }

  test("kernels match the SQL formulation on malformed UTF-8 (no String round-trip)") {
    // cast(binary as string) reinterprets bytes — 0xFF is not valid UTF-8,
    // so a String round-trip would substitute U+FFFD and diverge. (A
    // TRAILING truncated multi-byte sequence is excluded: Spark's own
    // substring reads past the buffer there — see the charStarts scaladoc.)
    val raw = Array[Byte](0xff.toByte) ++ "abcdefgh ".getBytes("UTF-8") ++
      Array[Byte](0xc3.toByte) ++ " ij kl".getBytes("UTF-8")
    val df = Seq(Tuple1(raw)).toDF("b").select($"b".cast("string").as("text"))
    val cmp = df.select(
      MinHashExpressions.minHashSigs($"text", 5, 8).as("native"),
      sqlSigs(5, 8).as("sql"))
    assert(cmp.filter($"native" =!= $"sql").count() == 0)
    val win = df.select(
      MinHashExpressions.winnowingPrints($"text", 5, 4).as("native"),
      expr("""array_sort(array_distinct(transform(sequence(1, length(text) - 4), p ->
        |array_min(transform(sequence(p, least(p + 3, length(text) - 4)), i ->
        |  md5(substring(text, i, 5)))))))""".stripMargin).as("sql"))
      .select(array_sort($"native").as("native"), $"sql")
    assert(win.filter($"native" =!= $"sql").count() == 0)
  }

  test("two simhash instances in one projection stay correct (codegen scope)") {
    // non-nullable children put both expansions in the same codegen scope;
    // a fixed local name would collide and silently fall back
    val df = Seq(("alpha beta", "gamma delta")).toDF("a", "b")
    val r = df.select(
      MinHashExpressions.simHash32(coalesce($"a", lit(""))).as("sa"),
      MinHashExpressions.simHash32(coalesce($"b", lit(""))).as("sb"))
      .as[(Long, Long)].head()
    val single = (t: String) => Seq(t).toDF("t")
      .select(MinHashExpressions.simHash32($"t")).as[Long].head()
    assert(r._1 == single("alpha beta") && r._2 == single("gamma delta"))
  }

  test("wordCounts kernel equals the (doc, word) count aggregate") {
    val docs = texts.unionByName(Seq((900L, ""), (901L, "a b a b a")).toDF("doc_id", "text"))
    val native = docs.select($"doc_id",
        explode(MinHashExpressions.wordCounts($"text")).as("tc"))
      .select($"doc_id", $"tc.w", $"tc.cnt")
      .as[(Long, String, Long)].collect().toSet
    val expected = docs.select($"doc_id",
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(native == expected)
    assert(native.contains((901L, "a", 3L)) && native.contains((901L, "b", 2L)))
    assert(!native.exists(_._1 == 900L), "wordless doc must drop")
  }

  test("charBigramCounts equals the substring bigram aggregate") {
    // multi-alphabet random texts plus an interior-malformed doc
    val malformed = Array[Byte](0x61) ++ Array[Byte](0xff.toByte) ++
      "bc de".getBytes("UTF-8")
    val docs = texts.unionByName(
      Seq(Tuple1(malformed)).toDF("b")
        .select(lit(900L).as("doc_id"), $"b".cast("string").as("text")))
      .unionByName(Seq((901L, ""), (902L, "x")).toDF("doc_id", "text"))
    val native = docs.select($"doc_id",
        explode(MinHashExpressions.charBigramCounts($"text")).as("gc"))
      .select($"doc_id", $"gc.g", $"gc.cnt")
      .as[(Long, String, Long)].collect().toSet
    val expected = docs.filter(length($"text") >= 2)
      .select($"doc_id",
        explode(expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(native == expected)
    assert(native.exists(_._1 == 900L), "malformed doc must produce bigrams")
    assert(!native.exists(r => r._1 == 901L || r._2 == 902L),
      "sub-2-char docs must drop")
  }

  test("kernels are SQL-callable after install") {
    MinHashExpressions.install(spark)
    val r = Seq(("alpha beta alpha", 1)).toDF("text", "i").selectExpr(
      "graft_simhash32(text) AS sh",
      "size(graft_minhash_sigs(text, 5, 8)) AS n_sigs",
      "size(graft_winnowing(text, 5, 4)) AS n_prints",
      "size(graft_word_gram_hashes(text, 2)) AS n_grams",
      "graft_repetition_stats(text).n_words AS n_words",
      "size(graft_word_counts(text)) AS n_terms").head()
    assert(r.getInt(1) == 8 && r.getInt(3) == 2 &&
      r.getLong(4) == 3L && r.getInt(5) == 2)
    val direct = Seq("alpha beta alpha").toDF("text")
      .select(MinHashExpressions.simHash32($"text")).as[Long].head()
    assert(r.getLong(0) == direct)
    intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs('x', 'not-an-int', 8)").collect()
    }
  }

  test("short and null texts yield null, never a crash") {
    val df = Seq((1L, "abcd"), (2L, null: String), (3L, "abcde"))
      .toDF("doc_id", "text")
      .select($"doc_id", MinHashExpressions.minHashSigs($"text", 5, 8).as("s"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1) && !rows(2).isNullAt(1))
  }
}
