package graft.sources

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** Property-based round-trip of the commit-log string codec: authors and
  * messages are user-controlled and land in hand-built JSON
  * (TemporalTable.escapeJson / unescapeJson / parseField), so arbitrary
  * quotes, backslashes, control characters, and non-ASCII must survive
  * escape → embed → regex-extract → unescape bit-for-bit, including
  * through a real file write. Raw scalacheck with fixed seeds (the
  * scalatestplus bridge isn't on the classpath). */
class MetaCodecPropertySpec extends SparkSpec {
  import spark.implicits._

  private val nastyChar: Gen[Char] = Gen.frequency(
    (5, Gen.alphaNumChar),
    (2, Gen.oneOf('"', '\\', '\n', '\r', '\t', '{', '}', ':', ',')),
    (1, Gen.choose(0.toChar, 0x1f.toChar)),
    (1, Gen.choose(0x80.toChar, 0x2fff.toChar)))

  private val nastyString: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, nastyChar)).map(_.mkString)

  private def samples(n: Int): Seq[String] =
    (1 to n).flatMap(i => nastyString.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("escape/unescape round-trips arbitrary strings") {
    samples(200).foreach { s =>
      val rt = TemporalTable.unescapeJson(TemporalTable.escapeJson(s))
      assert(rt == s, s"round-trip broke for ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("parseField extracts escaped fields from a commit-shaped JSON line") {
    samples(100).grouped(2).foreach { pair =>
      val (author, message) = (pair.head, pair.last)
      val json = s"""{"revision":7,"commitTsMs":123,"author":"${TemporalTable
        .escapeJson(author)}","message":"${TemporalTable.escapeJson(message)}"}"""
      assert(TemporalTable.parseField(json, "revision") == "7")
      assert(TemporalTable.parseField(json, "author") == author)
      assert(TemporalTable.parseField(json, "message") == message)
    }
  }

  test("parseField handles multi-kilobyte values with O(1) stack (regex regression)") {
    // the pre-fix regex recursed once per character of a string value —
    // a 32-file revision's `files` manifest (~2 KB) overflowed the stack
    val bigManifest = (0 until 500)
      .map(i => s"part-$i-0123456789abcdef-c000.snappy.parquet|${i * 1000}")
      .mkString(";")
    val json = s"""{"revision":42,"commitTsMs":1,"author":"a","message":"m",""" +
      s""""files":"${TemporalTable.escapeJson(bigManifest)}"}"""
    assert(json.length > 20000)
    assert(TemporalTable.parseField(json, "files") == bigManifest)
    assert(TemporalTable.parseField(json, "revision") == "42")
    // a value that CONTAINS a key-shaped string must not satisfy a probe
    // for that key with garbage — the scan resumes past it
    val tricky = """{"message":"fake \"revision\": x","revision":9}"""
    assert(TemporalTable.parseField(tricky, "revision") == "9")
    // absent key → empty
    assert(TemporalTable.parseField(json, "nope") == "")
  }

  test("commit metadata survives a real write-read cycle") {
    samples(10).grouped(2).foreach { pair =>
      val (author, message) = (pair.head, pair.last)
      val p = Files.createTempDirectory("graft-meta-prop").resolve("tbl").toString
      TemporalTable.write(Seq(1L).toDF("node_key"), p,
        author = author, message = message, withManifest = false)
      val c = TemporalTable.commits(p).head
      assert(c.author == author && c.message == message,
        s"file round-trip broke for author=${author.map(_.toInt).mkString(",")} " +
          s"message=${message.map(_.toInt).mkString(",")}")
    }
  }
}
