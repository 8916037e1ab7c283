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
  *  1. ONE stats scan: every column's 2^bits equi-depth boundaries come
  *     from a single `approx_percentile`-per-column aggregate (boundary
  *     lists are tiny driver-side literals); equi-depth (not equi-width, cf
  *     [[Stats.equiDepthHistogram]]'s same comparison-chain assignment) so
  *     skewed columns still spread across codes;
  *  2. rank codes are materialized ONCE per row as intermediate columns,
  *     then interleaved into one Morton value (bits × nCols shift-or
  *     terms) — the comparison chains are not re-inlined per bit position;
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

  /** Equi-depth boundary lists for all columns in ONE scan. Fails with a
    * clear message on a no-non-null-rows column (approx_percentile
    * returns null there). */
  private def depthBounds(df: DataFrame, cols: Seq[String],
                          bits: Int): Seq[Seq[Double]] = {
    val n = 1 << bits
    val qs = (1 until n).map(i => i.toDouble / n).mkString(",")
    val aggs = cols.map(c =>
      expr(s"approx_percentile(CAST(`$c` AS DOUBLE), array($qs))"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      require(!row.isNullAt(i),
        s"Layout: column `${cols(i)}` has no non-null rows")
      row.getSeq[Double](i)
    }
  }

  /** Rank-code assignment: count of boundaries strictly below the value
    * (the [[Stats.equiDepthHistogram]] bucket chain). */
  private def codeExpr(c: String, bounds: Seq[Double]): Column = {
    val v = col(c).cast("double")
    bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v > lit(b), 1L).otherwise(0L)
    }
  }

  private def interleave(codes: Seq[Column], bits: Int): Column = {
    val k = codes.size
    val terms = for {
      i <- 0 until bits
      (code, j) <- codes.zipWithIndex
    } yield shiftleft(shiftright(code, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  private def validate(df: DataFrame, cols: Seq[String], bits: Int): Unit = {
    require(cols.size >= 2, "Z-order needs at least 2 columns to interleave")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits ($bits) × cols (${cols.size}) must fit a long")
    // resolve through the session's own rules (case sensitivity etc.) so a
    // missing column fails here with Spark's did-you-mean message
    cols.foreach(df(_))
  }

  /** The Morton (bit-interleaved) value of the given columns' rank codes,
    * as one self-contained expression. For INSPECTION and small frames:
    * each comparison chain is inlined per bit position here —
    * [[writeZOrdered]] materializes the codes once per row instead. */
  def zOrderValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    validate(df, cols, bits)
    val bounds = depthBounds(df, cols, bits)
    interleave(cols.zip(bounds).map { case (c, b) => codeExpr(c, b) }, bits)
  }

  /** Rewrite `df` as a Z-ordered parquet table: `nFiles` files, each
    * covering a compact Morton range of `cols`. Point/range predicates on
    * any clustered column then touch ~(selectivity^(1/nCols)) of the files
    * instead of all of them — the multi-column file-skipping a single-sort
    * layout cannot give. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 8): Unit = {
    validate(df, cols, bits)
    require(nFiles >= 1, "nFiles must be >= 1")
    val codeCols = cols.indices.map(i => s"__zc_$i")
    val reserved = "__z" +: codeCols
    require(!df.columns.exists(reserved.contains),
      s"input already has a ${reserved.mkString("/")} column")
    val bounds = depthBounds(df, cols, bits)
    // codes land as real columns first, so each comparison chain is
    // evaluated once per row, not once per interleaved bit
    val withCodes = cols.zip(bounds).zipWithIndex.foldLeft(df) {
      case (d, ((c, b), i)) => d.withColumn(codeCols(i), codeExpr(c, b))
    }
    withCodes
      .withColumn("__z", interleave(codeCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(reserved: _*)
      .write.mode("overwrite").parquet(path)
  }
}
