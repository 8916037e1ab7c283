package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TemporalTable.{escapeJson, parseField}

/** Write-time table statistics sidecar — the sum/NDV extension of the
  * footer zone-map fold ([[graft.plans.MinMaxFromMetadataRule]]).
  *
  * Parquet footers carry min/max/nullCount per row group but no sums and
  * no distinct counts, so unfiltered `SUM` / `AVG` / `COUNT(DISTINCT)`
  * shapes always pay a full column scan — at any table size, for an
  * answer that is a pure function of the (immutable) files. The reference
  * keeps exactly this class of statistic materialized in its page tree
  * (page/pax/NumberZoneMapRegion.java aggregates per-region; index
  * summaries serve whole-resource counts without touching records), and
  * modern lakehouse formats do the same at the table layer (Iceberg
  * puffin NDV sketches, Snowflake metadata sums). Here the statistics
  * ride in a `_stats` sidecar next to the data files: one line-oriented
  * JSON file (the commit-log encoding) holding per-column
  * count/nulls/sum/min/max and optional exact NDV, plus a fingerprint —
  * relative path, length, mtime — of EVERY data file the stats were
  * computed from.
  *
  * Trust model: the fold ([[graft.plans.AggFromStatsRule]]) re-lists the
  * scan's files at rewrite time and requires the fingerprint to match
  * exactly — any added, removed, or in-place-rewritten file (external
  * writers produce deterministic part names; length+mtime catch same-name
  * rewrites, the [[graft.plans.MinMaxFromMetadataRule]] staleness
  * discipline) disables the rewrite and the query runs as an ordinary
  * scan. Correctness degrades to the scan, never to a stale answer. A
  * torn/missing/unparseable sidecar likewise only disables the
  * optimization.
  *
  * Scale shape: the sidecar is O(columns + files) driver-side metadata —
  * one small read at plan time regardless of table size; computing it at
  * write time is one aggregate pass over data already resident for the
  * write (map-side partials, a ≤1-row exchange).
  */
object StatsSidecar {

  /** Sidecar file name, directly under the data directory. Underscore
    * prefix keeps it invisible to Spark's and DuckDB's data listings. */
  val FileName = "_stats"

  val Version = 1

  /** Per-column statistics. `sum`/`min`/`max` are present only for
    * integral columns (byte/short/int/long — exact, order-independent);
    * `ndv` only when exact distinct counting was requested at write time.
    * A `None` sum on an integral column with non-null rows means the
    * column was all-null. */
  final case class ColStats(
      name: String,
      count: Long, // non-null values
      nulls: Long,
      sum: Option[Long],
      minMax: Option[(Long, Long)],
      ndv: Option[Long])

  /** `files` are (path relative to the stats dir, length, mtime). */
  final case class TableStats(
      rows: Long,
      files: Seq[(String, Long, Long)],
      cols: Map[String, ColStats])

  private def statsPath(dir: String) = s"$dir/$FileName"

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** NDV-eligible: atomic, hashable, order-insensitive distinct. */
  private def ndvEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BooleanType | DateType | TimestampType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  private def relativize(dirUri: String, fileUri: String): String = {
    val d = if (dirUri.endsWith("/")) dirUri else dirUri + "/"
    require(fileUri.startsWith(d), s"$fileUri not under $d")
    fileUri.substring(d.length)
  }

  /** Compute and write the sidecar for the parquet files currently under
    * `dir`. `ndvCols` asks for exact distinct counts of those columns (on
    * top of the always-computed per-column count/nulls and integral
    * sum/min/max); dictionary-encoded columns ([[graft.operators.Dict]])
    * and their code columns are included automatically — their NDV is the
    * one `COUNT(DISTINCT key)` shapes ask for.
    *
    * The file list is taken BEFORE the data is read and the frame is
    * built from exactly those files, so the fingerprint provably covers
    * the rows the statistics describe — a concurrent append between
    * listing and read changes neither. Returns false (writing nothing)
    * when the directory has no parquet files and no schema to describe.
    */
  def write(spark: SparkSession, dir: String, ndvCols: Seq[String] = Nil): Boolean = {
    val statuses = MetaIO.listDataFileStatus(dir, ".parquet")
    if (statuses.isEmpty) return false
    val dirUri = MetaIO.fs(dir).makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
    val files = statuses.map { st =>
      (relativize(dirUri, st.getPath.toString), st.getLen, st.getModificationTime)
    }
    val df = spark.read.parquet(statuses.map(_.getPath.toString): _*)
    write0(df, files, dir, ndvCols)
  }

  private def write0(df: DataFrame, files: Seq[(String, Long, Long)], dir: String,
                     ndvCols: Seq[String]): Boolean = {
    val fields = df.schema.fields.toSeq
    // internal agg aliases are "__"-prefixed; a data column named that way
    // could shadow them in the one-row result — skip rather than risk it
    if (fields.exists(_.name.startsWith("__"))) return false
    val dictCols = graft.operators.Dict.dictionariesOf(df.schema).keys.toSeq
    val autoNdv = (dictCols ++ dictCols.map(graft.operators.Dict.codeCol)).toSet
    val wantNdv = fields.filter(f =>
      (ndvCols.contains(f.name) || autoNdv.contains(f.name)) && ndvEligible(f.dataType))
      .map(_.name).toSet

    // one aggregate row: rows, then per column [count, sum?, min?, max?, ndv?]
    val aggs = Seq.newBuilder[org.apache.spark.sql.Column]
    aggs += count(lit(1)).as("__rows")
    fields.foreach { f =>
      val c = col(s"`${f.name}`")
      aggs += count(c).as(s"__cnt_${f.name}")
      if (isIntegral(f.dataType)) {
        aggs += sum(c).cast(LongType).as(s"__sum_${f.name}")
        aggs += min(c).cast(LongType).as(s"__min_${f.name}")
        aggs += max(c).cast(LongType).as(s"__max_${f.name}")
      }
      if (wantNdv.contains(f.name)) aggs += count_distinct(c).as(s"__ndv_${f.name}")
    }
    val all = aggs.result()
    val row = df.agg(all.head, all.tail: _*).collect()(0)
    val rows = row.getAs[Long]("__rows")

    def optLong(name: String): Option[Long] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[Long](name))
      else None

    val cols = fields.map { f =>
      val cnt = row.getAs[Long](s"__cnt_${f.name}")
      val mm = (optLong(s"__min_${f.name}"), optLong(s"__max_${f.name}")) match {
        case (Some(lo), Some(hi)) => Some((lo, hi))
        case _ => None
      }
      ColStats(f.name, cnt, rows - cnt, optLong(s"__sum_${f.name}"), mm,
        optLong(s"__ndv_${f.name}"))
    }

    val sb = new StringBuilder
    sb ++= s"""{"kind":"meta","version":$Version,"rows":$rows}\n"""
    files.foreach { case (p, l, m) =>
      sb ++= s"""{"kind":"file","path":"${escapeJson(p)}","len":$l,"mtime":$m}\n"""
    }
    cols.foreach { c =>
      val extra = new StringBuilder
      c.sum.foreach(s => extra ++= s""","sum":$s""")
      c.minMax.foreach { case (lo, hi) => extra ++= s""","min":$lo,"max":$hi""" }
      c.ndv.foreach(n => extra ++= s""","ndv":$n""")
      sb ++= s"""{"kind":"col","name":"${escapeJson(c.name)}","count":${c.count},"nulls":${c.nulls}$extra}\n"""
    }
    MetaIO.writeStringOverwrite(statsPath(dir), sb.toString)
    true
  }

  /** Parse the sidecar under `dir`; None when absent or unreadable. */
  def read(dir: String): Option[TableStats] = {
    val p = statsPath(dir)
    try {
      if (!MetaIO.exists(p)) return None
      val lines = MetaIO.readString(p).split('\n').filter(_.nonEmpty)
      var rows = -1L
      val files = Seq.newBuilder[(String, Long, Long)]
      val cols = Map.newBuilder[String, ColStats]
      lines.foreach { line =>
        parseField(line, "kind") match {
          case "meta" =>
            if (parseField(line, "version").toInt != Version) return None
            rows = parseField(line, "rows").toLong
          case "file" =>
            files += ((parseField(line, "path"), parseField(line, "len").toLong,
              parseField(line, "mtime").toLong))
          case "col" =>
            val name = parseField(line, "name")
            def opt(field: String): Option[Long] = {
              val v = parseField(line, field)
              if (v.isEmpty) None else Some(v.toLong)
            }
            val mm = (opt("min"), opt("max")) match {
              case (Some(lo), Some(hi)) => Some((lo, hi))
              case _ => None
            }
            cols += name -> ColStats(name, parseField(line, "count").toLong,
              parseField(line, "nulls").toLong, opt("sum"), mm, opt("ndv"))
          case _ => return None
        }
      }
      if (rows < 0) None else Some(TableStats(rows, files.result(), cols.result()))
    } catch { case _: Exception => None }
  }

  /** True iff the sidecar's fingerprint matches `current` — the same
    * (relative path, length, mtime) set, nothing more, nothing less. */
  def fresh(stats: TableStats, current: Seq[(String, Long, Long)]): Boolean =
    stats.files.toSet == current.toSet && stats.files.size == current.size
}
