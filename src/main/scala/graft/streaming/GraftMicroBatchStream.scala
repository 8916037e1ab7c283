package graft.streaming

import graft.sources.{GraftTemporalSource, TemporalTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Revision offset for the commit-log stream (serialized into the
  * checkpoint log — exactly-once across restarts). */
final case class RevisionOffset(revision: Int) extends Offset {
  override def json(): String = s"""{"revision":$revision}"""
}

/** A real `MicroBatchStream` over a graft temporal table's COMMIT LOG
  * (SURVEY §2.12 — replaces the file-stream approximation for consumers
  * that need revision-atomic batches): the offset axis is the committed
  * revision number, so each micro-batch contains exactly the rows of the
  * revisions committed since the last batch — never a partial revision,
  * even while a writer is mid-commit (reserved-but-uncommitted `rev=N/`
  * directories are invisible because offsets advance on commit-log
  * entries, not directory listings).
  *
  * Partition planning and row reading delegate wholesale to Spark's
  * parquet batch scan over the batch's revision directories — vectorized
  * decode, pushdown and AQE-sized splits for free; this class only decides
  * WHICH directories constitute the batch.
  *
  * Use via [[ChangeFeed.streamCommits]].
  */
final class GraftMicroBatchStream(tablePath: String, schema: StructType,
                                  maxRevisionsPerBatch: Int = 0)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def committed: Seq[Int] = TemporalTable.commits(tablePath).map(_.revision)

  override def initialOffset(): Offset = RevisionOffset(0)

  override def latestOffset(): Offset =
    RevisionOffset(committed.lastOption.getOrElse(0))

  // ---- admission control + Trigger.AvailableNow ----------------------
  // AvailableNow pins the end of the run to the revisions committed when
  // the trigger fired (commits landing mid-run wait for the next run),
  // then drains toward it in bounded batches; `maxRevisionsPerBatch`
  // bounds any batch — replaying a 10k-revision history is then a series
  // of bounded jobs instead of one 10k-directory scan.

  @volatile private var availableNowEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(committed.lastOption.getOrElse(0))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[RevisionOffset].revision
    val cap = availableNowEnd.getOrElse(committed.lastOption.getOrElse(0))
    val eligible = committed.filter(r => r > s && r <= cap)
    val taken =
      if (maxRevisionsPerBatch > 0) eligible.take(maxRevisionsPerBatch) else eligible
    RevisionOffset(taken.lastOption.getOrElse(s))
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    RevisionOffset(TemporalTable.parseField(json, "revision").toInt)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  /** The delegate batch scan over the given revision directories. */
  private def delegate(label: String, paths: Seq[String]): Batch = {
    val opts = new CaseInsensitiveStringMap(
      Map("path" -> tablePath, "basePath" -> tablePath).asJava)
    val table = ParquetTable(s"graft-stream $tablePath $label",
      SparkSession.active, opts, paths, Some(schema), classOf[ParquetFileFormat])
    table.newScanBuilder(opts).build().toBatch
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RevisionOffset].revision
    val e = end.asInstanceOf[RevisionOffset].revision
    val revs = committed.filter(r => r > s && r <= e)
    if (revs.isEmpty) Array.empty
    else {
      // effective-dir resolution: a replay over in-place-compacted history
      // reads each revision's live generation (RevisionCompaction) — the
      // raw rev=N directory may have been vacuumed
      val ovs = graft.sources.RevisionCompaction.overlays(tablePath)
      delegate(s"($s,$e]",
        revs.map(r => graft.sources.RevisionCompaction.effectiveDir(tablePath, r, ovs)))
        .planInputPartitions()
    }
  }

  // the parquet reader factory is partition-schema-driven (an empty path
  // list would infer NO rev partition and null it out of every row), so
  // it is built over the whole table — but ONCE, cached for the stream's
  // lifetime. Building it per micro-batch forced a recursive listing of
  // every revision directory each batch: O(revisions) LISTs per batch on
  // the aged tables this stream targets.
  private lazy val readerFactory: PartitionReaderFactory =
    delegate("factory", Seq(tablePath)).createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = readerFactory
}
