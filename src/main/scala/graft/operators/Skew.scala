package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (builder brief: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool for pathological single-key hotspots (one key holding
  * a double-digit percentage of a 100 TB fact table), because AQE can only
  * split a skewed partition AFTER the skewed shuffle files exist, while
  * salting spreads the hot key across `saltFactor` reducers up front.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `keys` with the large side salted:
    * large rows get a random salt in [0, saltFactor); the small side is
    * replicated `saltFactor` times (explode — bounded, it's the small
    * side). The shuffle key becomes (keys…, salt), splitting each hot key
    * into `saltFactor` independent reducers. Semantics equal the plain
    * inner join.
    *
    * The salt is derived from a hash of the large row's full tuple, not
    * `rand()`, so the plan stays deterministic/replayable (a task retry
    * re-salts identically).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Top-n heavy-hitter keys with their share of the table — the probe you
    * run before deciding to salt. One partial-agg count per key. */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share", round(col("cnt") / total, 6))
      .orderBy(desc("cnt"))
      .limit(topN)
  }
}
