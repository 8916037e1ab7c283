package graft.streaming

import graft.sources.{MetaIO, TemporalTable}
import org.apache.spark.sql.DataFrame

/** Streaming ingest INTO the versioned table — the write half of the
  * reference's continuous-ingestion surface (its REST layer commits a
  * revision per accepted document batch,
  * bundles/sirix-rest-api/src/main/kotlin/io/sirix/rest/crud/json/JsonCreate.kt;
  * here a Structured Streaming query commits a revision per micro-batch):
  *
  * {{{
  * stream.writeStream
  *   .foreachBatch(TemporalSink.revisionWriter("/data/db/res"))
  *   .option("checkpointLocation", ...)
  *   .start()
  * }}}
  *
  * Each non-empty micro-batch becomes one revision through the full
  * commit protocol (reservation, manifest, key index, post-commit hooks),
  * so every downstream temporal operator — as-of reads, diffs,
  * [[ChangeFeed.revisionFeed]] — sees streamed data with the same
  * guarantees as batch writes, and the change feed composes: stream in,
  * feed incrementally out.
  *
  * Exactly-once: Structured Streaming re-runs a failed batch with the
  * SAME batchId, so the writer stamps `batch=<id>` into the commit
  * message and skips any id at or below the highest marker the commit
  * log carries — a retried batch can never double-commit (the
  * reference's one-writer commit protocol gives the log-read-then-write
  * sequence a single owner).
  *
  * ONE STREAM PER TABLE PATH AT A TIME: batch ids are monotonic only
  * within a single query's checkpoint, and the replay check is
  * read-log-then-write, not atomic. Two concurrent streams (or a stream
  * racing a batch writer that fakes `batch=` markers) can both observe a
  * marker absent and double-commit the same id — point concurrent
  * pipelines at distinct table paths and merge downstream.
  *
  * SEQUENTIAL queries against one table need `appId` (Delta's txnAppId
  * discipline): a NEW query's fresh checkpoint restarts batch ids at 0,
  * and under the unscoped default its first batches would compare
  * against the previous query's markers and be silently dropped. Give
  * each logical query a stable appId — markers become
  * `app=<id> batch=<n>` and watermarks are tracked per (path, appId),
  * so a new appId starts from a clean slate while replays within the
  * same query stay no-ops.
  */
object TemporalSink {

  private def marker(appId: String, batchId: Long): String =
    if (appId.isEmpty) s"batch=$batchId" else s"app=$appId batch=$batchId"

  /** Parse a commit message as THIS appId's marker (exact prefix match —
    * an unscoped parse must not claim another app's markers and vice
    * versa). */
  private def parseMarker(appId: String, msg: String): Option[Long] = {
    val prefix = if (appId.isEmpty) "batch=" else s"app=$appId batch="
    if (msg.startsWith(prefix))
      scala.util.Try(msg.stripPrefix(prefix).toLong).toOption
    else None
  }

  /** Per-path replay watermark: the highest commit-log revision this
    * process has read, and the highest `batch=` marker id seen in entries
    * at or below it. The log is append-only with zero-padded revision
    * file names, so refreshing costs ONE directory listing plus a GET per
    * UNSEEN entry — usually zero or one — instead of re-reading the whole
    * O(revisions) log every micro-batch (at the reference's 10k-revision
    * posture that was 10k metadata GETs per batch on object storage).
    * Process-local only: the first batch after a restart pays one full
    * log read to rebuild it, which is the pre-cache behavior. */
  private final case class Watermark(rev: Int, maxBatch: Long)

  private val watermarks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Watermark]()

  private def refreshed(path: String, appId: String): Watermark = {
    val key = (path, appId)
    val prev = Option(watermarks.get(key))
      .getOrElse(Watermark(Int.MinValue, Long.MinValue))
    val dir = TemporalTable.commitsDir(path)
    val unseen = MetaIO.list(dir)
      .filter(_.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".json").toInt).toOption
        .filter(_ > prev.rev).map(r => r -> n))
    val next =
      if (unseen.isEmpty) prev
      else {
        val batchIds = MetaIO.parallelMap(unseen.map(_._2)) { name =>
          parseMarker(appId,
            TemporalTable.parseField(MetaIO.readString(s"$dir/$name"), "message"))
            .getOrElse(Long.MinValue)
        }
        Watermark(unseen.map(_._1).max, (prev.maxBatch +: batchIds).max)
      }
    watermarks.put(key, next)
    next
  }

  /** Drop the cached watermark for `path` — specs use this to simulate a
    * driver restart (the next refresh rebuilds from the commit log). */
  private[graft] def invalidate(path: String): Unit = {
    watermarks.keySet().removeIf(_._1 == path)
    ()
  }

  /** `foreachBatch` function committing one revision per non-empty
    * micro-batch, idempotent under batch replay (tail-read watermark —
    * see the class doc for the single-stream-per-path contract). */
  def revisionWriter(path: String, author: String = "graft-stream",
                     withManifest: Boolean = true,
                     withKeyIndex: Boolean = true,
                     appId: String = ""): (DataFrame, Long) => Unit = {
    require(!appId.contains(" ") && !appId.contains("\""),
      "appId must not contain spaces or quotes (it rides in the marker)")
    (batch, batchId) => {
      val wm = refreshed(path, appId)
      if (batchId > wm.maxBatch && !batch.isEmpty) {
        val rev = TemporalTable.write(batch, path, author,
          marker(appId, batchId),
          withManifest = withManifest, withKeyIndex = withKeyIndex)
        // advance past our own commit so the next refresh's listing
        // filter skips it without a GET
        watermarks.put((path, appId), Watermark(rev, batchId))
        ()
      }
    }
  }
}
