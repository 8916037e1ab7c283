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

  /** Version 2 added per-group sections; a v1 sidecar still serves the
    * ungrouped folds (readers accept both). */
  val Version = 2

  /** A group section is recorded only when the tuple has at most this
    * many distinct values — the same bound as a [[graft.operators.Dict]]
    * dictionary, keeping the sidecar O(small) driver-side metadata. */
  val MaxGroupValues = 4096

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

  /** One distinct value of a recorded group tuple: the tuple's value
    * tokens (None = SQL NULL; strings/integrals/booleans stringified —
    * the fold reconstructs typed values from the query attribute's
    * dataType), that group's row count, and per-column [[ColStats]].
    * NDV-requested columns carry an exact per-group distinct count;
    * other columns have `ndv = None` at group granularity. */
  final case class GroupEntry(
      value: Seq[Option[String]],
      rows: Long,
      cols: Map[String, ColStats])

  /** `files` are (path relative to the stats dir, length, mtime).
    * `groups` maps a recorded group tuple (column names, in recorded
    * order) to its complete value list — complete because it came from a
    * full `groupBy` over the same pinned file set, so a fold over it is
    * the whole answer, not a sample. */
  final case class TableStats(
      rows: Long,
      files: Seq[(String, Long, Long)],
      cols: Map[String, ColStats],
      groups: Map[Seq[String], Seq[GroupEntry]])

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

  /** Group-key-eligible: types whose values round-trip through a string
    * token losslessly and that the fold can reconstruct from the query
    * attribute's dataType. */
  private def groupEligible(dt: DataType): Boolean = dt match {
    case StringType | BooleanType => true
    case dt => isIntegral(dt)
  }

  /** Group-tuple column names ride in one `g` field joined on the unit
    * separator; a name containing it would be ambiguous, so such tuples
    * are refused (never seen in practice — it is a control character). */
  private[graft] val GroupSep = '\u001f'

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
    * `groupCols` additionally records per-group statistics for each given
    * group tuple — the distinct values of the tuple with that group's row
    * count and per-column count/sum/min/max — enabling
    * [[graft.plans.AggFromStatsRule]] to fold low-cardinality GROUP BY
    * shapes too (the micro-cube the reference keeps as index summaries).
    * A tuple is recorded only if it has ≤ [[MaxGroupValues]] distinct
    * values (checked, not assumed) and every column is group-eligible;
    * otherwise it is skipped silently — losing an optimization, never an
    * answer. Dictionary columns are added as single-column groups
    * automatically (their cardinality is dict-bounded by construction).
    * Each tuple costs one grouped aggregate pass at write time.
    *
    * The file list is taken BEFORE the data is read and the frame is
    * built from exactly those files, so the fingerprint provably covers
    * the rows the statistics describe — a concurrent append between
    * listing and read changes neither. Returns false (writing nothing)
    * when the directory has no parquet files and no schema to describe.
    */
  def write(spark: SparkSession, dir: String, ndvCols: Seq[String] = Nil,
            groupCols: Seq[Seq[String]] = Nil): Boolean = {
    val statuses = MetaIO.listDataFileStatus(dir, ".parquet")
    if (statuses.isEmpty) return false
    val dirUri = MetaIO.fs(dir).makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
    val files = statuses.map { st =>
      (relativize(dirUri, st.getPath.toString), st.getLen, st.getModificationTime)
    }
    val df = spark.read.parquet(statuses.map(_.getPath.toString): _*)
    write0(df, files, dir, ndvCols, groupCols)
  }

  private def write0(df: DataFrame, files: Seq[(String, Long, Long)], dir: String,
                     ndvCols: Seq[String], groupCols: Seq[Seq[String]] = Nil): Boolean = {
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

    // per-group sections: one grouped aggregate pass per recorded tuple.
    // A tuple whose distinct-value count exceeds the bound is skipped
    // (checked via limit(bound+1), never assumed). The tuple's own
    // columns carry no ColStats — within one group the group column is a
    // constant the fold can reconstruct from the group value itself.
    // NDV-requested columns additionally record an exact PER-GROUP
    // distinct count (the "distinct users per dept" monitoring shape);
    // the fold may only serve it when section entries map 1:1 to output
    // groups — see AggFromStatsRule.
    val autoGroups = dictCols.map(Seq(_))
    val wantedGroups = (groupCols ++ autoGroups).distinct.filter { tuple =>
      tuple.nonEmpty && tuple.size <= 16 && tuple.distinct.size == tuple.size &&
        !tuple.exists(_.contains(GroupSep)) &&
        tuple.forall(n => fields.exists(f => f.name == n && groupEligible(f.dataType)))
    }
    val groups = wantedGroups.flatMap { tuple =>
      val statCols = fields.filterNot(f => tuple.contains(f.name))
      val gaggs = Seq.newBuilder[org.apache.spark.sql.Column]
      gaggs += count(lit(1)).as("__rows")
      statCols.foreach { f =>
        val c = col(s"`${f.name}`")
        gaggs += count(c).as(s"__cnt_${f.name}")
        if (isIntegral(f.dataType)) {
          gaggs += sum(c).cast(LongType).as(s"__sum_${f.name}")
          gaggs += min(c).cast(LongType).as(s"__min_${f.name}")
          gaggs += max(c).cast(LongType).as(s"__max_${f.name}")
        }
        if (wantNdv.contains(f.name)) gaggs += count_distinct(c).as(s"__ndv_${f.name}")
      }
      val ga = gaggs.result()
      val grows = df.groupBy(tuple.map(n => col(s"`$n`")): _*)
        .agg(ga.head, ga.tail: _*).limit(MaxGroupValues + 1).collect().toSeq
      if (grows.size > MaxGroupValues) None
      else Some(tuple -> grows.map { r =>
        val value = tuple.map { n =>
          val i = r.fieldIndex(n)
          if (r.isNullAt(i)) None else Some(r.get(i).toString)
        }
        def opt(nm: String): Option[Long] =
          if (r.schema.fieldNames.contains(nm) && !r.isNullAt(r.fieldIndex(nm)))
            Some(r.getAs[Long](nm))
          else None
        val n = r.getAs[Long]("__rows")
        GroupEntry(value, n, statCols.map { f =>
          val cnt = r.getAs[Long](s"__cnt_${f.name}")
          val mm = (opt(s"__min_${f.name}"), opt(s"__max_${f.name}")) match {
            case (Some(lo), Some(hi)) => Some((lo, hi))
            case _ => None
          }
          f.name -> ColStats(f.name, cnt, n - cnt, opt(s"__sum_${f.name}"), mm,
            opt(s"__ndv_${f.name}"))
        }.toMap)
      })
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
    // group lines: value tokens ride as v0..vk (always written; a set
    // nullmask bit marks position i as SQL NULL, so "" stays a real empty
    // string). Stats fields precede the tokens so parseField never scans
    // past user data to find them.
    groups.foreach { case (tuple, entries) =>
      val g = escapeJson(tuple.mkString(GroupSep.toString))
      entries.foreach { e =>
        val mask = e.value.zipWithIndex.collect { case (None, i) => 1L << i }
          .foldLeft(0L)(_ | _)
        val vs = e.value.zipWithIndex.map { case (v, i) =>
          s""","v$i":"${escapeJson(v.getOrElse(""))}""""
        }.mkString
        sb ++= s"""{"kind":"grow","g":"$g","nullmask":$mask,"rows":${e.rows}$vs}\n"""
        e.cols.values.foreach { c =>
          val extra = new StringBuilder
          c.sum.foreach(s => extra ++= s""","sum":$s""")
          c.minMax.foreach { case (lo, hi) => extra ++= s""","min":$lo,"max":$hi""" }
          c.ndv.foreach(n => extra ++= s""","ndv":$n""")
          sb ++= s"""{"kind":"gcol","g":"$g","nullmask":$mask,"name":"${escapeJson(c.name)}","count":${c.count},"nulls":${c.nulls}$extra$vs}\n"""
        }
      }
    }
    MetaIO.writeStringOverwrite(statsPath(dir), sb.toString)
    absentAt.remove(cacheKey(dir)) // our own write must be visible to the next query
    true
  }

  // parsed sidecars, keyed by the sidecar FILE's identity (qualified
  // path, length, mtime) — a rewritten sidecar gets a new mtime and a new
  // entry, so a hit can never serve outdated statistics (the
  // MinMaxFromMetadataRule staleness-key discipline). Bounded LRU; the
  // cache only avoids re-PARSING — data-file freshness is still checked
  // per query by the fold rule.
  private val parseCache =
    new java.util.LinkedHashMap[(String, Long, Long), TableStats](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), TableStats]): Boolean =
        size > 64
    }

  // Negative cache: dirs recently probed and found to carry NO sidecar.
  // Every driver-provided table is sidecar-less, and the fold rule runs on
  // every aggregate plan — without this each such query pays a pointless
  // metadata GET per optimizer pass (real latency against object storage).
  // Short TTL bounds the staleness window: a sidecar written by ANOTHER
  // process becomes visible within AbsentTtlMs (missing only an
  // optimization, never an answer); a sidecar written in THIS JVM
  // invalidates the entry immediately (write0 below), so our own
  // write-then-query pipelines always see it.
  // bounded LRU: expired entries were never evicted (only overwritten on
  // re-probe), so a long-lived driver probing aged sidecar-less tables
  // (one entry per revision dir) leaked negative entries for the JVM's
  // lifetime. 4096 live negatives cover any realistic working set.
  private val absentAt =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
          size() > 4096
      })
  private[graft] val AbsentTtlMs = 30000L

  /** Cache key: the FS-qualified URI, so the writer's raw path and the
    * fold rule's qualified rootPath land on the SAME entry (a stale
    * negative entry under a second spelling would hide a fresh sidecar
    * for a TTL). Resolving the FileSystem object is a Hadoop-level cache
    * hit, not an RPC. */
  private def cacheKey(dir: String): String =
    try MetaIO.fs(dir).makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
    catch { case _: Exception => dir }

  /** FS probes actually performed by [[read]] (negative-cache misses) —
    * test-visible so specs can pin O(1) probes per query on sidecar-less
    * tables (the [[MetaIO.readCount]] instrumentation discipline). */
  private[graft] val probeCount = new java.util.concurrent.atomic.AtomicLong()

  /** Parse the sidecar under `dir`; None when absent or unreadable. */
  def read(dir: String): Option[TableStats] = {
    val p = statsPath(dir)
    try {
      val now = System.currentTimeMillis()
      val negKey = cacheKey(dir)
      val neg = absentAt.get(negKey)
      if (neg != null && now - neg < AbsentTtlMs) return None
      probeCount.incrementAndGet()
      if (!MetaIO.exists(p)) { absentAt.put(negKey, now); return None }
      absentAt.remove(negKey)
      val st = MetaIO.fs(p).getFileStatus(new org.apache.hadoop.fs.Path(p))
      val key = (st.getPath.toString, st.getLen, st.getModificationTime)
      parseCache.synchronized {
        Option(parseCache.get(key))
      } match {
        case some @ Some(_) => return some
        case None =>
          val parsed = parse(MetaIO.readString(p))
          parsed.foreach(ts => parseCache.synchronized { parseCache.put(key, ts); () })
          return parsed
      }
    } catch { case _: Exception => None }
  }

  private def parse(content: String): Option[TableStats] = {
    try {
      val lines = content.split('\n').filter(_.nonEmpty)
      var rows = -1L
      val files = Seq.newBuilder[(String, Long, Long)]
      val cols = Map.newBuilder[String, ColStats]
      // group sections accumulate out of line order: grow rows keyed by
      // (tuple, value), gcol stats joined onto them at the end
      val growRows = collection.mutable.LinkedHashMap
        .empty[(Seq[String], Seq[Option[String]]), Long]
      val gcolStats = collection.mutable.Map
        .empty[(Seq[String], Seq[Option[String]]), Map[String, ColStats]]
        .withDefaultValue(Map.empty)
      def groupKey(line: String): (Seq[String], Seq[Option[String]]) = {
        val g = parseField(line, "g").split(GroupSep).toSeq
        val mask = parseField(line, "nullmask").toLong
        val value = g.indices.map { i =>
          if (((mask >> i) & 1L) == 1L) None else Some(parseField(line, s"v$i"))
        }
        (g, value)
      }
      lines.foreach { line =>
        parseField(line, "kind") match {
          case "meta" =>
            if (parseField(line, "version").toInt > Version) return None
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
          case "grow" =>
            growRows(groupKey(line)) = parseField(line, "rows").toLong
          case "gcol" =>
            val key = groupKey(line)
            val name = parseField(line, "name")
            def opt(field: String): Option[Long] = {
              val v = parseField(line, field)
              if (v.isEmpty) None else Some(v.toLong)
            }
            val mm = (opt("min"), opt("max")) match {
              case (Some(lo), Some(hi)) => Some((lo, hi))
              case _ => None
            }
            gcolStats(key) = gcolStats(key) + (name -> ColStats(name,
              parseField(line, "count").toLong, parseField(line, "nulls").toLong,
              opt("sum"), mm, opt("ndv")))
          case _ => return None
        }
      }
      val groups = growRows.toSeq
        .map { case ((g, v), n) => (g, GroupEntry(v, n, gcolStats((g, v)))) }
        .groupBy(_._1).map { case (g, es) => g -> es.map(_._2) }
      if (rows < 0) None
      else Some(TableStats(rows, files.result(), cols.result(), groups))
    } catch { case _: Exception => None }
  }

  /** True iff the sidecar's fingerprint matches `current` — the same
    * (relative path, length, mtime) set, nothing more, nothing less. */
  def fresh(stats: TableStats, current: Seq[(String, Long, Long)]): Boolean =
    stats.files.toSet == current.toSet && stats.files.size == current.size
}
