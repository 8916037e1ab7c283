package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** [[FileIndex]] built from the commit log's per-revision file manifests
  * (see [[TemporalTable.logCommit]], with any [[RevisionCompaction]]
  * overlay already applied — file paths are RELATIVE TO THE TABLE ROOT,
  * so a compacted revision's `rev=N/_c2/...` generation files plug in
  * unchanged) — NO filesystem listing at plan time. An aged table's
  * history read costs O(commit-log entries) metadata GETs (already paid
  * by the log read itself) instead of one directory listing per revision;
  * the reference makes the same move by resolving every page from its
  * UberPage tree rather than scanning storage
  * (bundles/sirix-core/src/main/java/io/sirix/page/UberPage.java).
  *
  * Exposes `rev` as the single partition column, so Catalyst partition
  * pruning works exactly as on the listed layout: a `rev = N` predicate
  * reaches [[listFiles]] as a partition filter and drops every other
  * revision's files before the scan plans splits. */
private[graft] class CommitLogFileIndex(
    tablePath: String,
    revFiles: Seq[(Int, Seq[(String, Long)])],
    revTimesMs: Map[Int, Long] = Map.empty) extends FileIndex {

  override val partitionSchema: StructType =
    StructType(Seq(StructField("rev", IntegerType, nullable = true)))

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  // parquet split planning reads the block size; any sane constant works
  // for remote stores (splits are range reads, not block-aligned)
  private val blockSize = 128L * 1024 * 1024

  private lazy val partitions: Seq[PartitionDirectory] =
    revFiles.map { case (rev, files) =>
      // mtime = the revision's commit timestamp: a fabricated 0 made
      // _metadata.file_modification_time read 1970-01-01 and weakened
      // (path, len, mtime) cache keys derived from this index's listing
      val mtime = revTimesMs.getOrElse(rev, 0L)
      PartitionDirectory(InternalRow(rev), files.map { case (rel, size) =>
        new FileStatus(size, false, 1, blockSize, mtime,
          new Path(s"$tablePath/$rel"))
      }.toArray)
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) partitions
    else {
      // single partition column: every attribute in a partition filter is
      // `rev`, bound to slot 0 of the partition values row
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case _: AttributeReference =>
            BoundReference(0, IntegerType, nullable = true)
        })
      partitions.filter(p => bound.eval(p.values))
    }

  override def inputFiles: Array[String] =
    revFiles.flatMap { case (_, files) =>
      files.map { case (rel, _) => s"$tablePath/$rel" }
    }.toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    revFiles.iterator.flatMap(_._2.iterator.map(_._2)).sum
}
