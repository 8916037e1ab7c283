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
  * ONE STREAM PER TABLE PATH: batch ids are monotonic only within a
  * single query's checkpoint, and the replay check is read-log-then-
  * write, not atomic. Two concurrent streams (or a stream racing a batch
  * writer that fakes `batch=` markers) can both observe a marker absent
  * and double-commit the same id — point concurrent pipelines at
  * distinct table paths and merge downstream.
  */
object TemporalSink {

  private def marker(batchId: Long): String = s"batch=$batchId"

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
    new java.util.concurrent.ConcurrentHashMap[String, Watermark]()

  private val MarkerRe = "batch=(-?\\d+)".r

  private def refreshed(path: String): Watermark = {
    val prev = Option(watermarks.get(path))
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
          TemporalTable.parseField(MetaIO.readString(s"$dir/$name"), "message") match {
            case MarkerRe(id) => id.toLong
            case _ => Long.MinValue
          }
        }
        Watermark(unseen.map(_._1).max, (prev.maxBatch +: batchIds).max)
      }
    watermarks.put(path, next)
    next
  }

  /** Drop the cached watermark for `path` — specs use this to simulate a
    * driver restart (the next refresh rebuilds from the commit log). */
  private[graft] def invalidate(path: String): Unit = {
    watermarks.remove(path)
    ()
  }

  /** `foreachBatch` function committing one revision per non-empty
    * micro-batch, idempotent under batch replay (tail-read watermark —
    * see the class doc for the single-stream-per-path contract). */
  def revisionWriter(path: String, author: String = "graft-stream",
                     withManifest: Boolean = true,
                     withKeyIndex: Boolean = true): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val wm = refreshed(path)
      if (batchId > wm.maxBatch && !batch.isEmpty) {
        val rev = TemporalTable.write(batch, path, author, marker(batchId),
          withManifest = withManifest, withKeyIndex = withKeyIndex)
        // advance past our own commit so the next refresh's listing
        // filter skips it without a GET
        watermarks.put(path, Watermark(rev, batchId))
        ()
      }
    }
}
