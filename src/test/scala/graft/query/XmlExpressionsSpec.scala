package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the fused native XML expressions — the XMark
  * replays pin them end-to-end against reference outputs, but the
  * corpus barely exercises escaping; these cases do. */
class XmlExpressionsSpec extends SparkSpec {

  private def serializeOf(xml: String): String = {
    val json = XmlItem.xmlToJson(xml)
    // the document wrapper's first child is the root element
    val df = spark.range(1).select(
      org.apache.spark.sql.graftbridge.GraftBridge.column(
        graft.functions.XmlSerialize(
          org.apache.spark.sql.graftbridge.GraftBridge.expression(
            get(variant_get(parse_json(lit(json)), "$['~c']",
              "array<variant>"), lit(0))))).as("x"))
    df.collect().head.getString(0)
  }

  private def textsOf(xml: String, names: Seq[String]): String = {
    val json = XmlItem.xmlToJson(xml)
    spark.range(1).select(
      org.apache.spark.sql.graftbridge.GraftBridge.column(
        graft.functions.XmlChildTexts(
          org.apache.spark.sql.graftbridge.GraftBridge.expression(
            get(variant_get(parse_json(lit(json)), "$['~c']",
              "array<variant>"), lit(0))), names)).as("t"))
      .collect().head.getString(0)
  }

  test("XmlSerialize round-trips markup-significant characters") {
    val xml = "<a k=\"x &amp; &quot;y&quot;\">1 &lt; 2 &amp; 3 &gt; 2</a>"
    assert(serializeOf(xml) ===
      "<a k=\"x &amp; &quot;y&quot;\">1 &lt; 2 &amp; 3 &gt; 2</a>")
  }

  test("XmlSerialize keeps whitespace text nodes and self-closes empties") {
    val xml = "<r>\n  <b>hi</b>\n  <empty></empty>\n</r>"
    assert(serializeOf(xml) === "<r>\n  <b>hi</b>\n  <empty/>\n</r>")
  }

  test("XmlSerialize nests mixed content in document order") {
    val xml = "<p>before<b>bold</b>after</p>"
    assert(serializeOf(xml) === "<p>before<b>bold</b>after</p>")
  }

  test("XmlChildTexts walks child chains and space-joins text items") {
    val xml = "<r><a><b>one</b><b>two</b></a><a><b>three</b></a></r>"
    assert(textsOf(xml, Seq("a", "b")) === "one two three")
  }

  test("XmlChildTexts skips whitespace-free misses and decodes entities") {
    val xml = "<r>\n  <a><b>x &amp; y</b></a>\n  <c><b>no</b></c>\n</r>"
    assert(textsOf(xml, Seq("a", "b")) === "x & y")
    assert(textsOf(xml, Seq("zzz")) === "")
  }

  test("XmlMemberShape fails loudly on a truncated member encoding") {
    // the member encoding is the engine's own StAX output: a mid-stream
    // parse failure is storage corruption, and swallowing it would
    // leave a half-filled typed row that pushed typed filters use to
    // silently DROP members the variant walk matches
    import org.apache.spark.sql.graftbridge.GraftBridge
    val enc = """{"~n":"person","~a":{"id":"p1"},""" +
      """"~c":[{"~n":"age","~a":{},"~c":["31"]}]}"""
    def shapeOf(memberJson: String) = {
      import spark.implicits._
      Seq(memberJson).toDF("member_json").select(
        GraftBridge.column(graft.functions.XmlMemberShape(
          GraftBridge.expression(col("member_json")),
          Seq("id" -> "string"), Seq("age" -> "bigint"))).as("s"))
        .collect().head.getStruct(0)
    }
    // the intact encoding types both fields
    val ok = shapeOf(enc)
    assert(ok.getString(0) == "person")
    assert(ok.getStruct(1).getString(0) == "p1")
    assert(ok.getStruct(1).getLong(1) == 31L)
    // the truncated one throws — never a half-typed row
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](shapeOf(enc.substring(0, enc.length - 12)))
    assert(msgs(e).exists(_.contains("corrupt member encoding")),
      msgs(e).mkString(" | "))
  }
}
