package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows hit key 1 (pathological hot key)
  private lazy val fact = ((1 to 900).map(i => (1L, i.toDouble)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toDouble))).toDF("k", "v")
  private lazy val dim = (1L to 10L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedJoin result equals the plain inner join") {
    val plain = fact.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("salting spreads the hot key across reducers") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(8)).cast("int"))
    val spread = salted.filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread >= 6, s"hot key only spread to $spread salts") // ~8 expected
  }

  test("keySkewProfile surfaces the heavy hitter with its share") {
    val prof = Skew.keySkewProfile(fact, Seq("k"), 3)
      .as[(Long, Long, Double)].collect()
    assert(prof.head._1 == 1L && prof.head._2 == 900L && prof.head._3 == 0.9)
  }

  test("deterministic salting: same input salts identically (replayable)") {
    val s1 = Skew.saltedJoin(fact, dim, Seq("k"), 4).orderBy("k", "v").collect()
    val s2 = Skew.saltedJoin(fact, dim, Seq("k"), 4).orderBy("k", "v").collect()
    assert(s1.toSeq == s2.toSeq)
  }
}
