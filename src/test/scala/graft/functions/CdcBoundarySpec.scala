package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pin the Gear-CDC BOUNDARY placement itself — the oracle rows verify
  * chunk accounting (coverage, aggregate re-derivation), not where the
  * cuts land, so a drifted gear table, mask or min/max size could pass
  * them. Here a second, naive reimplementation (plain String walk,
  * independently re-derived splitmix64 gear table) recomputes every
  * boundary; any constant drift in the kernel reds this spec. A golden
  * boundary prefix is additionally pinned literally, so a simultaneous
  * drift of BOTH implementations cannot slip through either. */
class CdcBoundarySpec extends SparkSpec {
  import spark.implicits._

  /** Independently re-derived gear table (splitmix64 over the index —
    * the constants the kernel promises to keep fixed forever). */
  private val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Naive chunker: walk the string one CHARACTER at a time (surrogate
    * pairs = one code point = one UTF-8 sequence), roll the Gear hash
    * over each character's UTF-8 bytes, cut on the kernel's contract:
    * (clen >= minChars && (h & mask) == 0) || clen >= maxChars || last.
    * Returns (startChar, lenChars). Completely separate code path from
    * CdcKernel: String/codePoint stepping instead of byte-offset tables,
    * per-character getBytes instead of one buffer walk. */
  private def naiveBoundaries(text: String, avgBits: Int, minChars: Int,
                              maxChars: Int): Seq[(Int, Int)] = {
    val cps = text.codePoints().toArray
    val mask = (1L << avgBits) - 1L
    val out = Seq.newBuilder[(Int, Int)]
    var start = 0
    var h = 0L
    for (i <- cps.indices) {
      new String(Character.toChars(cps(i))).getBytes("UTF-8")
        .foreach(b => h = (h << 1) + gear(b & 0xff))
      val clen = i - start + 1
      if ((clen >= minChars && (h & mask) == 0L) || clen >= maxChars ||
          i == cps.length - 1) {
        out += ((start, clen))
        start = i + 1
        h = 0L
      }
    }
    out.result()
  }

  /** Deterministic mixed-script fixture: ASCII, Latin-1 accents, CJK and
    * an astral emoji — multi-byte character stepping exercised end to
    * end. */
  private val fixture: String = {
    val rnd = new scala.util.Random(4242)
    val alphabet = "abcdefgh ётя汉字🦉"
    val cps = alphabet.codePoints().toArray
    (1 to 3000).map(_ => new String(Character.toChars(
      cps(rnd.nextInt(cps.length))))).mkString
  }

  private def kernelChunks(text: String, avgBits: Int, minChars: Int,
                           maxChars: Int): Seq[(Int, Int, Long)] =
    Seq(Tuple1(text)).toDF("t")
      .select(explode(CdcExpressions.cdcChunks($"t", avgBits, minChars, maxChars))
        .as("c"))
      .select($"c.start", $"c.len", $"c.hash")
      .as[(Int, Int, Long)].collect().toSeq

  test("kernel boundaries equal the naive reimplementation (mixed scripts, 3 configs)") {
    for ((avgBits, minC, maxC) <- Seq((6, 16, 256), (4, 2, 32), (5, 8, 64))) {
      val got = kernelChunks(fixture, avgBits, minC, maxC).map(c => (c._1, c._2))
      val want = naiveBoundaries(fixture, avgBits, minC, maxC)
      assert(got == want,
        s"boundary drift at avgBits=$avgBits min=$minC max=$maxC: " +
          s"kernel ${got.take(5)}... naive ${want.take(5)}...")
      // boundaries partition the text: contiguous, full coverage
      assert(got.head._1 == 0 && got.map(_._2).sum == fixture.codePointCount(0, fixture.length))
      got.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 == s2)
        case _ => ()
      }
    }
  }

  test("chunk hashes equal xxhash64 of the exact substrings") {
    val chunks = kernelChunks(fixture, 6, 16, 256)
    val recomputed = chunks.toDF("start", "len", "hash")
      .withColumn("t", lit(fixture))
      .withColumn("sub_hash", xxhash64(expr("substring(t, start + 1, len)")))
      .filter($"hash" =!= $"sub_hash").count()
    assert(recomputed == 0, "chunk hash is not xxhash64(substring)")
  }

  test("degenerate shapes: short text, forced max cuts") {
    // shorter than minChars → exactly one chunk covering everything
    assert(naiveBoundaries("tiny", 6, 16, 256) == Seq((0, 4)))
    assert(kernelChunks("tiny", 6, 16, 256).map(c => (c._1, c._2)) == Seq((0, 4)))
    // constant text: the gear hash cycles — agreement must hold through
    // forced maxChars cuts as well
    val aaa = "a" * 1000
    assert(kernelChunks(aaa, 6, 16, 100).map(c => (c._1, c._2)) ==
      naiveBoundaries(aaa, 6, 16, 100))
  }

  test("golden boundary prefix (drift in BOTH implementations still reds)") {
    val got = kernelChunks(fixture, 6, 16, 256).map(c => (c._1, c._2))
    // literal values pinned from the frozen gear table/mask/min-max
    // contract; recompute ONLY on a deliberate, documented re-chunk of
    // the storage format — stored corpus chunk tables depend on these
    val golden = Seq((0, 107), (107, 54), (161, 16), (177, 61),
      (238, 34), (272, 46), (318, 29), (347, 23))
    assert(got.take(8) == golden,
      s"gear/mask/min-max contract drifted: ${got.take(8)}")
    assert(naiveBoundaries(fixture, 6, 16, 256).take(8) == golden)
  }
}
