package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-skipping layout: Z-order (Morton) clustering.
  *
  * The Spark-side analog of the reference's CAS index + page-skip registry
  * (bundles/sirix-core/src/main/java/io/sirix/index/cas/CASIndexBuilder.java:42,
  * index/pageskip/PageSkipRegistry.java, page/pax/NumberZoneMapRegion.java:63):
  * where the reference keeps a secondary value index per path, columnar
  * storage gets the same pruning from file/row-group min-max statistics —
  * IF the file layout correlates with the filter columns. A single-column
  * sort gives that for one column only; interleaving the bits of several
  * columns' equi-depth rank codes gives every interleaved column locality,
  * so a predicate on ANY of them skips most files (the Delta/Databricks
  * `OPTIMIZE ZORDER BY` design, public since Delta Lake 2.0).
  *
  * Mechanics, all codegen'd built-ins:
  *  1. per column: an equi-depth `bits`-wide rank code — boundaries from
  *     one `approx_percentile` job (2^bits values, driver-side literals),
  *     assignment a chain of comparisons (same shape as
  *     [[Stats.equiDepthHistogram]]); equi-depth (not equi-width) so
  *     skewed columns still spread across codes;
  *  2. interleave the code bits into one Morton value (bits × nCols
  *     shift-or terms);
  *  3. `repartitionByRange` on the Morton value + sort within partitions:
  *     each output file covers a compact Z-range, so its min-max envelope
  *     on every clustered column is narrow, and ordinary Parquet
  *     stats-based skipping does the rest — no index structure to
  *     maintain, the layout IS the index.
  *
  * Scale shape: one stats job + one range-exchange of the data (any
  * clustering rewrite pays this); skew in the Morton value is handled by
  * range partitioning's sampled boundaries.
  */
object Layout {

  /** Equi-depth rank code (0 .. 2^bits − 1) for one column: boundary list
    * collected once (tiny), assignment map-side. */
  private def depthCode(df: DataFrame, c: String, bits: Int): Column = {
    val n = 1 << bits
    val qs = (1 until n).map(i => i.toDouble / n)
    val bounds = df
      .agg(expr(s"approx_percentile(CAST(`$c` AS DOUBLE), array(${qs.mkString(",")}))"))
      .head().getSeq[Double](0)
    val v = col(c).cast("double")
    bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v > lit(b), 1L).otherwise(0L)
    }
  }

  /** The Morton (bit-interleaved) value of the given columns' rank codes.
    * `bits` per column; total width bits × nCols ≤ 63. */
  def zOrderValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.size >= 2, "zOrderValue needs at least 2 columns to interleave")
    require(bits * cols.size <= 63, s"bits ($bits) × cols (${cols.size}) must fit a long")
    val codes = cols.map(c => depthCode(df, c, bits))
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (code, j) <- codes.zipWithIndex
    } yield shiftleft(shiftright(code, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` as a Z-ordered parquet table: `nFiles` files, each
    * covering a compact Morton range of `cols`. Point/range predicates on
    * any clustered column then touch ~(selectivity^(1/nCols)) of the files
    * instead of all of them — the multi-column file-skipping a single-sort
    * layout cannot give. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 8): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    df.withColumn("__z", zOrderValue(df, cols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
