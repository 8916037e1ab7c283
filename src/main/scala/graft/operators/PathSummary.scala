package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Path summary: the reference's inferred structural schema + per-path
  * statistics (SURVEY.md §1.3; bundles/sirix-core/src/main/java/io/sirix/
  * index/path/summary/PathSummaryReader.java:68).
  *
  * On Spark the schema IS the path DAG, so the summary is: enumerate every
  * leaf path from the static StructType, then count non-null occurrences
  * per path in ONE aggregation pass (all counts are columns of a single
  * `agg`, so the table is scanned once however many paths exist). The
  * result is the `sdb:path-summary` surface: (path, type, non-null count).
  */
object PathSummary {

  /** All leaf paths with their types. Arrays are leaves (element counts
    * are a different statistic); structs recurse. */
  def leafPaths(schema: StructType): Seq[(String, DataType)] = {
    def walk(st: StructType, prefix: String): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => walk(s, p)
          case dt => Seq(p -> dt)
        }
      }
    walk(schema, "")
  }

  /** One-pass summary: (path, data_type, n_nonnull). */
  def of(df: DataFrame): DataFrame = {
    val paths = leafPaths(df.schema)
    val countCols = paths.zipWithIndex.map { case ((p, _), i) =>
      count(col(p)).as(s"c_$i")
    }
    val wide = df.agg(countCols.head, countCols.tail: _*).head()
    val rows = paths.zipWithIndex.map { case ((p, dt), i) =>
      Row(p, dt.simpleString, wide.getLong(i))
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("data_type", StringType, nullable = false),
        StructField("n_nonnull", LongType, nullable = false))))
  }
}
