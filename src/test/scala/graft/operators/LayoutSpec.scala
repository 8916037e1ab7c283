package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("graft-zorder").resolve("t").toString

  test("z-order layout skips files on EITHER clustered column; single-sort cannot") {
    // 100k rows over two near-uniform, independent dimensions
    val df = spark.range(100000).select(
      (col("id") % 317).cast("double").as("x"),
      ((col("id") * 7919) % 997).cast("double").as("y"),
      col("id"))
    val zDir = freshPath()
    val linDir = freshPath()
    Layout.writeZOrdered(df, Seq("x", "y"), zDir, nFiles = 16)
    // the single-column alternative: range-partitioned + sorted by x only
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def filesTouched(path: String, cond: Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    val yCond = col("y") < 50.0 // ~5% selective on the SECOND column
    val zY = filesTouched(zDir, yCond)
    val linY = filesTouched(linDir, yCond)
    assert(linY == 16, s"x-sorted layout unexpectedly skipped on y ($linY/16)")
    assert(zY <= 8, s"z-order touched $zY/16 files for a 5% y-predicate")

    val xCond = col("x") < 16.0 // ~5% selective on the first column
    assert(filesTouched(zDir, xCond) <= 8,
      "z-order lost x-locality entirely")

    // layout rewrite preserves the data
    assert(spark.read.parquet(zDir).filter(yCond).count() == df.filter(yCond).count())
    assert(spark.read.parquet(zDir).count() == 100000L)
  }

  test("guards: all-null column and reserved-name collision fail clearly") {
    import spark.implicits._
    val bad = Seq((Some(1.0), Option.empty[Double]), (Some(2.0), None)).toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      Layout.writeZOrdered(bad, Seq("x", "y"), freshPath(), 2))
    assert(e.getMessage.contains("no non-null rows"))
    val clash = Seq((1.0, 2.0, 3L)).toDF("x", "y", "__z")
    val e2 = intercept[IllegalArgumentException](
      Layout.writeZOrdered(clash, Seq("x", "y"), freshPath(), 2))
    assert(e2.getMessage.contains("__z"))
  }

  test("zOrderValue interleaves equi-depth codes deterministically") {
    val df = spark.range(1024).select(
      col("id").cast("double").as("x"),
      ((col("id") * 7919) % 1024).cast("double").as("y"))
    val z1 = df.withColumn("z", Layout.zOrderValue(df, Seq("x", "y"), bits = 4))
      .orderBy("x").select("z").collect().map(_.getLong(0)).toSeq
    val z2 = df.withColumn("z", Layout.zOrderValue(df, Seq("x", "y"), bits = 4))
      .orderBy("x").select("z").collect().map(_.getLong(0)).toSeq
    assert(z1 == z2, "z values must be deterministic")
    // 4-bit codes over 2 cols → values fit 8 bits
    assert(z1.forall(z => z >= 0 && z < 256))
    // independent dimensions populate far more of the key space than
    // either 16-value code alone — the interleave genuinely mixes both
    assert(z1.distinct.size > 64, s"interleave collapsed the key space: ${z1.distinct.size}")
  }
}
