package graft.plans

import graft.SparkSpec
import graft.operators.Dict
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pinning of the dictionary-surrogate bijection: for
  * arbitrary (unicode, empty, null-bearing) low-cardinality string
  * columns, encode → decode must reproduce every value, and an
  * aggregation through [[DictAggRule]] must group exactly like the plain
  * string path. Raw scalacheck with fixed seeds. */
class DictPropertySpec extends SparkSpec {
  import spark.implicits._

  private val valueGen: Gen[String] = Gen.frequency(
    (4, Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)),
    (1, Gen.const("")),
    (1, Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0x80.toChar, 0x2fff.toChar))).map(_.mkString)))

  private def sample(seed: Long): Seq[Option[String]] = {
    val g = for {
      vocab <- Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, valueGen))
      rows <- Gen.listOfN(60,
        Gen.frequency((9, Gen.oneOf(vocab).map(Option(_))), (1, Gen.const(Option.empty[String]))))
    } yield rows
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
  }

  test("encode→decode reproduces every value; grouping matches the string path") {
    DictAggRule.install(spark)
    (1L to 5L).foreach { seed =>
      val rows = sample(seed)
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
        val enc = Dict.encode(df, Seq("s"))
        val dc = enc.schema(Dict.codeCol("s"))
        val values = dc.metadata.getStringArray(Dict.MetaValues)
        // dictionary is sorted and exactly the distinct non-null values
        assert(values.toSeq == rows.flatten.distinct.sorted)
        // decode(code) == original, null ↔ null, on every row
        val bad = enc.select(col("s"),
            element_at(typedLit(values), col(Dict.codeCol("s")) + 1).as("dec"))
          .filter(!(col("s") <=> col("dec"))).count()
        assert(bad == 0L, s"seed $seed: $bad rows failed decode round-trip")
        // rule-rewritten grouping == plain grouping (write through parquet
        // so the rewrite actually fires on the scan)
        val p = java.nio.file.Files.createTempDirectory("graft-dict-prop")
          .resolve("t").toString
        enc.write.parquet(p)
        val viaRule = spark.read.parquet(p).groupBy("s").count()
          .orderBy(asc_nulls_first("s")).as[(Option[String], Long)].collect().toSeq
        val plain = df.groupBy("s").count()
          .orderBy(asc_nulls_first("s")).as[(Option[String], Long)].collect().toSeq
        assert(viaRule == plain, s"seed $seed: grouped counts diverged")
      }
    }
  }
}
