package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Transaction-time / valid-time operators over "history frames".
  *
  * A history frame is any DataFrame carrying a stable record identity column
  * (the reference's `nodeKey` — docs/ARCHITECTURE.md:527-529) plus a
  * monotonically increasing ordering column per key (revision number or
  * commit/event timestamp). All operators are single-shuffle window or
  * aggregate plans partitioned by the key column, so they scale linearly with
  * executor count — no driver-side iteration, no broadcast of the fact side.
  *
  * Reference surface covered (SURVEY.md §2.8):
  * `jn:all-times` (axis/temporal/AllTimeAxis.java:20), `jn:past`/`jn:future`
  * (PastAxis.java:22/FutureAxis.java:22), `jn:previous`/`jn:next`
  * (PreviousAxis.java:17/NextAxis.java:17), `jn:first`/`jn:last`
  * (FirstAxis.java:17/LastAxis.java:17), `jn:first-existing`/`jn:last-existing`
  * (function/jn/temporal/FirstExisting.java), `jn:valid-at`
  * (function/jn/temporal/ValidAt.java:45), `jn:open-bitemporal`
  * (function/jn/temporal/OpenBitemporal.java:53).
  */
object Temporal {

  /** Turn a changelog (one row per mutation) into a history frame by
    * assigning dense per-key revision numbers in `orderCols` order.
    * One shuffle on `keyCol`; the window is computed within partitions.
    */
  def asHistory(changelog: DataFrame, keyCol: String, orderCols: Seq[String],
                revCol: String = "revision"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    changelog.withColumn(revCol, row_number().over(w))
  }

  /** `jn:all-times`: every version of every key (identity on a history
    * frame; provided for API symmetry and for revision-range restriction). */
  def allTimes(hist: DataFrame): DataFrame = hist

  /** `jn:past`/`jn:future` relative to a revision bound. */
  def past(hist: DataFrame, revCol: String, rev: Int, orSelf: Boolean = false): DataFrame =
    hist.filter(if (orSelf) col(revCol) <= rev else col(revCol) < rev)

  def future(hist: DataFrame, revCol: String, rev: Int, orSelf: Boolean = false): DataFrame =
    hist.filter(if (orSelf) col(revCol) >= rev else col(revCol) > rev)

  /** `jn:previous`/`jn:next`: adjacent-revision values per key via lag/lead
    * (SURVEY.md §2.5 — the reference walks PreviousAxis/NextAxis cursors; on
    * Spark this is one window over the key partition). */
  def withPreviousNext(hist: DataFrame, keyCol: String, orderCols: Seq[String],
                       valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    valueCols.foldLeft(hist) { (df, c) =>
      df.withColumn(s"prev_$c", lag(c, 1).over(w))
        .withColumn(s"next_$c", lead(c, 1).over(w))
    }
  }

  /** `jn:first`/`jn:last`: earliest and latest version of each value per key. */
  def firstLast(hist: DataFrame, keyCol: String, orderCols: Seq[String],
                valueCol: String): DataFrame = {
    val base = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val wAll = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist.withColumn("first_" + valueCol, first(valueCol).over(wAll))
      .withColumn("last_" + valueCol, last(valueCol).over(wAll))
      .select(col(keyCol), col("first_" + valueCol), col("last_" + valueCol))
      .distinct()
  }

  /** `jn:first-existing`/`jn:last-existing`: the revision bounds per key. */
  def existenceBounds(hist: DataFrame, keyCol: String, revCol: String): DataFrame =
    hist.groupBy(keyCol).agg(
      min(revCol).as("first_existing"),
      max(revCol).as("last_existing"),
      count(lit(1)).as("n_revisions"))

  /** As-of snapshot of a changelog: for each key, the latest row with
    * `tsCol <= ts`. Single shuffle on the key; the per-key top-1 is a
    * window inside the partition (no global sort, no collect). */
  def asOf(changelog: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
           ts: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieBreak).desc)
    changelog.filter(col(tsCol) <= ts)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Row-level as-of join (SURVEY.md §2.3 as-of row): for every left row,
    * attach the latest right row whose `rightTs <= leftTs` for the same
    * key. Spark has no native as-of join; the scalable formulation is the
    * union-window technique — tag both sides, sort right-before-left at
    * equal timestamps, and carry the last right payload forward with an
    * ignoreNulls window. ONE shuffle on the key, no range join, no
    * per-left-row probe; the right payload travels as a single struct so
    * all its columns come from the SAME right row even when right values
    * are legitimately null.
    *
    * Duplicate right timestamps for a key are resolved DETERMINISTICALLY:
    * ties order by `rightTieBreak` (a right value column) when given, else
    * by the whole payload struct (lexicographic over its fields) — the
    * carried row is the tie-group maximum either way, never
    * partition-order-dependent (the repo's hash-determinism convention).
    *
    * @return all left columns plus right value columns prefixed `asof_`
    *         (null when no right row precedes the left row)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightValueCols: Seq[String],
               rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      left.withColumn("__ts", col(leftTsCol)).withColumn("__src", lit(1))
        .withColumn("__payload", lit(null).cast(
          org.apache.spark.sql.types.StructType(
            rightValueCols.map(c => org.apache.spark.sql.types.StructField(
              c, right.schema(c).dataType)))))
        .select(Seq(col(keyCol).as("__key"), col("__ts"), col("__src"), col("__payload")) ++
          leftCols.map(col): _*)
      .unionByName(
        // null right timestamps would sort first (asc nulls-first) and be
        // carried onto EVERY left row — the as-of contract is null-rejecting.
        // Null right KEYS are rejected too: the window's partitionBy groups
        // null with null, so a null-key right payload would be carried onto
        // null-key LEFT rows — SQL join semantics never match NULL to NULL
        right.filter(col(rightTsCol).isNotNull && col(keyCol).isNotNull)
          .withColumn("__ts", col(rightTsCol)).withColumn("__src", lit(0))
          .withColumn("__payload", struct(rightValueCols.map(col): _*))
          .select(col(keyCol).as("__key"), col("__ts"), col("__src"), col("__payload")),
        allowMissingColumns = true)
    // ordering by the payload struct requires all fields orderable —
    // maps are not; fall back to the pre-tie-break behavior for such
    // schemas unless an explicit (orderable) tie-break column is given
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }
    val tie: Seq[Column] = rightTieBreak match {
      case Some(c) => Seq(col(s"__payload.$c"))
      case None =>
        if (rightValueCols.forall(c => orderable(right.schema(c).dataType)))
          Seq(col("__payload"))
        else
          // best-effort determinism: ties order by a hash of the
          // serialized payload — stable given stable upstream row content
          // (a map's PHYSICAL entry order feeds the hash, so plans that
          // build maps shuffle-dependently should pass rightTieBreak)
          Seq(xxhash64(to_json(col("__payload"))))
    }
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts") +: col("__src") +: tie: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__carried.$c").as(s"asof_$c")): _*)
  }

  /** Derive `[valid_from, valid_to)` intervals from a changelog where each
    * new row supersedes the previous one for the same key (`valid_to` is
    * null for the open interval). */
  def asValidIntervals(changelog: DataFrame, keyCol: String, tsCol: String,
                       tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    changelog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(tsCol, 1).over(w))
  }

  /** `jn:valid-at`: interval stab — rows whose [valid_from, valid_to)
    * contains `ts`. A plain range predicate: Parquet min/max skipping prunes
    * files at scale (SURVEY.md §2.10 valid-time index row). */
  def validAt(intervals: DataFrame, ts: Column): DataFrame =
    intervals.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))

  /** `jn:open-bitemporal`: restrict on the transaction axis first, recompute
    * valid intervals within that snapshot, then stab on the valid axis. */
  def openBitemporal(changelog: DataFrame, keyCol: String, tsCol: String,
                     tieBreak: String, txFilter: Column, validTs: Column): DataFrame =
    validAt(asValidIntervals(changelog.filter(txFilter), keyCol, tsCol, tieBreak), validTs)
}
