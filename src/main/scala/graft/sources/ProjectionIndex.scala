package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Declared covering columnar projections over a temporal table
  * (SURVEY.md §2.10; reference: bundles/sirix-core/src/main/java/io/sirix/
  * index/projection/ProjectionIndexBuilder.java:52 with incremental
  * maintenance via ProjectionIndexChangeListener).
  *
  * A projection is a column-subset copy of every revision, stored in its
  * own `rev=N` layout next to the table:
  *
  * {{{
  * table/_projections/<name>.json      // {"name":..., "columns":[...]}
  * table/_proj/<name>/rev=N/           // projected snapshot of revision N
  * }}}
  *
  * The reference needs this because its row store must decode whole nodes;
  * on Spark, parquet column pruning already reads only requested columns —
  * what the projection still buys at 100 TB is I/O locality (a 3-column
  * projection of a 200-column table is a ~70× smaller scan unit, fewer
  * row groups, better page-cache density), which is exactly the
  * reference's projection-served fast path.
  *
  * Maintenance is incremental per commit ([[maintain]] — the
  * ChangeListener analog): only revisions missing from the projection are
  * (re)projected, each as a column-pruned scan of one snapshot.
  * [[readAuto]] serves a query from the projection when its column set
  * covers the request, else falls back to the base table.
  */
object ProjectionIndex {

  final case class Projection(name: String, columns: Seq[String])

  private def catalogDir(tablePath: String) = Paths.get(tablePath, "_projections")
  private def dataDir(tablePath: String, name: String) = s"$tablePath/_proj/$name"

  def list(tablePath: String): Seq[Projection] = {
    TemporalTable.listDir(catalogDir(tablePath))
      .filter(_.toString.endsWith(".json"))
      .map { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
        val name = """"name"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
        val cols = """"columns"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(s).get.group(1)
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          .filter(_.nonEmpty)
        Projection(name, cols)
      }.sortBy(_.name)
  }

  /** Declare a projection and build it for every existing revision. */
  def create(spark: SparkSession, tablePath: String, name: String,
             columns: Seq[String]): Unit = {
    require(columns.nonEmpty, "projection needs at least one column")
    Files.createDirectories(catalogDir(tablePath))
    val json = s"""{"name":"$name","columns":[${columns.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.write(catalogDir(tablePath).resolve(s"$name.json"),
      json.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    maintain(spark, tablePath, name)
  }

  /** Incremental maintenance: project exactly the revisions not yet
    * covered (called after each commit — the per-commit ChangeListener). */
  def maintain(spark: SparkSession, tablePath: String, name: String): Seq[Int] = {
    val proj = list(tablePath).find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown projection $name"))
    val have = {
      val d = Paths.get(dataDir(tablePath, name))
      TemporalTable.listDir(d)
        .map(_.getFileName.toString).filter(_.startsWith("rev="))
        .map(_.stripPrefix("rev=").toInt).toSet
    }
    val missing = TemporalTable.commits(tablePath).map(_.revision).filterNot(have)
    missing.foreach { rev =>
      spark.read.parquet(s"$tablePath/rev=$rev")
        .select(proj.columns.head, proj.columns.tail: _*)
        .write.mode("overwrite").parquet(s"${dataDir(tablePath, name)}/rev=$rev")
    }
    missing
  }

  /** Read one revision of a projection (latest by default). */
  def read(spark: SparkSession, tablePath: String, name: String,
           revision: Option[Int] = None): DataFrame = {
    val rev = revision.orElse(TemporalTable.mostRecentRevision(tablePath))
      .getOrElse(throw new IllegalArgumentException(s"no commits at $tablePath"))
    spark.read.parquet(s"${dataDir(tablePath, name)}/rev=$rev")
  }

  /** Serve `columns` from a covering projection when one exists (smallest
    * covering column set wins), else from the base snapshot — the
    * reference's projection-serving gate. */
  def readAuto(spark: SparkSession, tablePath: String, columns: Seq[String],
               revision: Option[Int] = None): DataFrame = {
    val rev = revision.orElse(TemporalTable.mostRecentRevision(tablePath))
      .getOrElse(throw new IllegalArgumentException(s"no commits at $tablePath"))
    val covering = list(tablePath)
      .filter(p => columns.forall(p.columns.contains))
      // the projection must actually be maintained for this revision —
      // a stale projection falls back to the base table, never errors
      .filter(p => Files.exists(Paths.get(s"${dataDir(tablePath, p.name)}/rev=$rev")))
      .sortBy(_.columns.size)
      .headOption
    covering match {
      case Some(p) =>
        read(spark, tablePath, p.name, revision).select(columns.head, columns.tail: _*)
      case None =>
        TemporalTable.read(spark, tablePath, revision)
          .select(columns.head, columns.tail: _*)
    }
  }
}
