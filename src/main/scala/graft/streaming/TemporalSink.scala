package graft.streaming

import graft.sources.TemporalTable
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
  * message and skips any id the commit log already carries — a retried
  * batch can never double-commit (the reference's one-writer commit
  * protocol gives the log-read-then-write sequence a single owner).
  */
object TemporalSink {

  private def marker(batchId: Long): String = s"batch=$batchId"

  /** `foreachBatch` function committing one revision per non-empty
    * micro-batch, idempotent under batch replay. */
  def revisionWriter(path: String, author: String = "graft-stream",
                     withManifest: Boolean = true,
                     withKeyIndex: Boolean = true): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val replayed = TemporalTable.exists(path) &&
        TemporalTable.commits(path).exists(_.message == marker(batchId))
      if (!replayed && !batch.isEmpty) {
        TemporalTable.write(batch, path, author, marker(batchId),
          withManifest = withManifest, withKeyIndex = withKeyIndex)
        ()
      }
    }
}
