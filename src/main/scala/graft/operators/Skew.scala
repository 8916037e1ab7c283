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
    * The salt derives from a hash of the large row's HASHABLE columns
    * (resolved with `df(name)`, so dotted column names work; map-typed
    * columns are skipped — xxhash64 refuses MapType, and determinism
    * doesn't need the full tuple), not `rand()`, so the plan stays
    * deterministic/replayable (a task retry re-salts identically). The
    * internal salt column name is collision-checked against both inputs —
    * silently clobbering a user's `__salt` would drop it from the
    * output. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val saltCol = "__salt"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"saltedJoin reserves the column name '$saltCol'; rename yours first")
    val hashable: Seq[Column] = large.schema.fields.toSeq
      .filter(f => !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => large(s"`${f.name.replace("`", "``")}`"))
    val saltSrc = if (hashable.nonEmpty) hashable
                  else Seq(monotonically_increasing_id())
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(saltSrc: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }

  /** Top-n heavy-hitter keys with their share of the table — the probe you
    * run before deciding to salt. ONE pass: per-key counts, the total from
    * a broadcast sum over the (tiny, post-aggregate) count table — the
    * prior `df.count()` probe scanned the 100 TB input twice. */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    counts.crossJoin(broadcast(counts.agg(sum("cnt").as("__total"))))
      .withColumn("share", round(col("cnt") / col("__total"), 6))
      .drop("__total")
      .orderBy(desc("cnt"))
      .limit(topN)
  }
}
