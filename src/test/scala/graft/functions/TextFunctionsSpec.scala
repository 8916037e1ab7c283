package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat and the dog of the house"),
    (1L, "el gato es el animal que vive en la casa"),
    (2L, "le chat et les chiens et le jardin"),
    (3L, "der hund und die katze und der vogel"),
    (4L, "xxxx yyyy zzzz")
  ).toDF("doc_id", "text")

  test("tokenCount counts non-empty whitespace tokens") {
    val n = Seq((0L, "a  b   c"), (1L, ""), (2L, "one")).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n == Map(0L -> 3, 1L -> 0, 2L -> 1))
  }

  test("occurrences counts literal substrings") {
    val c = Seq((0L, "a.b.c.d")).toDF("id", "t")
      .select(TextFunctions.occurrences($"t", ".").as("n")).as[Long].head()
    assert(c == 3L)
  }

  test("langId picks the marker-dominant language, und when none fire") {
    val pred = docs.select($"doc_id", TextFunctions.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(pred(0L) == "en" && pred(1L) == "es" && pred(2L) == "fr" && pred(3L) == "de")
    assert(pred(4L) == "und")
  }

  test("qualityMetrics and score are consistent") {
    val m = docs.filter($"doc_id" === 0L)
      .select(TextFunctions.qualityMetrics($"text").map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(m.getAs[Long]("n_chars") == 32L)
    assert(m.getAs[Long]("n_words") == 8L)
    val score = docs.select(TextFunctions.qualityScore($"text").as("q")).as[Double].collect()
    assert(score.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint strips case and punctuation") {
    val fp = Seq((0L, "The CAT!"), (1L, "the cat")).toDF("id", "t")
      .select(TextFunctions.fingerprint($"t").as("fp")).distinct()
    assert(fp.count() == 1)
  }

  test("canonicalizeUrl collapses scheme/www/fragment/tracking/slash variants") {
    val r = Seq(
      "HTTP://WWW.Example.com/Path/One/?utm_source=a&utm_medium=b&id=3#frag",
      "https://example.com/Path/One?id=3",
      "http://example.com/Path/One?ref=x&id=3",
      "https://other.com/CaseSensitive/",
      "https://a.com/p?utm_source=only", // tracking-only query → dropped whole
      "example.com"                      // schemeless bare host
    ).toDF("url").select(TextFunctions.canonicalizeUrl($"url").as("c"))
      .as[String].collect()
    assert(r(0) == "example.com/Path/One?id=3", r(0))
    assert(r(1) == "example.com/Path/One?id=3")
    assert(r(2) == "example.com/Path/One?id=3")
    assert(r(3) == "other.com/CaseSensitive") // path case preserved
    assert(r(4) == "a.com/p", r(4))
    assert(r(5) == "example.com")
  }

  test("canonicalizeUrl only strips tracking params at a ?/& separator") {
    val r = Seq(
      "https://a.com/path?href=one",          // 'ref' inside 'href' — keep
      "https://a.com/ref=oldstyle/page",      // path segment — keep
      "https://a.com/p?xutm_source=a&id=3",   // 'utm_' inside a name — keep
      "https://a.com/p?utm_a=1&utm_b=2&id=3", // adjacent tracking params
      "https://a.com/p?id=3&utm_a=1&utm_b=2"  // trailing tracking params
    ).toDF("url").select(TextFunctions.canonicalizeUrl($"url").as("c"))
      .as[String].collect()
    assert(r(0) == "a.com/path?href=one", r(0))
    assert(r(1) == "a.com/ref=oldstyle/page", r(1))
    assert(r(2) == "a.com/p?xutm_source=a&id=3", r(2))
    assert(r(3) == "a.com/p?id=3", r(3))
    assert(r(4) == "a.com/p?id=3", r(4))
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTP://WWW.Example.com/Path/One/?utm_source=a&utm_medium=b&id=3#frag",
      "https://a.com/p?utm_a=1&utm_b=2&id=3",
      "https://a.com/p?utm_source=only",
      "https://other.com/CaseSensitive/",
      "example.com").toDF("url")
    val once = urls.select(TextFunctions.canonicalizeUrl($"url").as("c"))
    val twice = once.select(TextFunctions.canonicalizeUrl($"c").as("c"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }
}
