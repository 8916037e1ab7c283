package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the manifest-diff slice: (A) the r16 broadcast
  * semi-join against the changed-bucket frame vs (B) the r17 collected
  * IN-set filter — interleaved so JIT/GC noise hits both. */
object ProfileDiffSliceAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.df(spark, sfDir, "lineitem")
      .withColumn("node_key", monotonically_increasing_id()).cache()
    li.count()
    val dir = java.nio.file.Files.createTempDirectory("pdsab").resolve("t").toString
    graft.sources.TemporalTable.write(li, dir)
    graft.sources.TemporalTable.write(
      li.withColumn("l_quantity",
        expr("CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 1 ELSE l_quantity END")),
      dir)
    val oneKey = li.agg(min(col("node_key"))).head().getLong(0)
    val dirOne = java.nio.file.Files.createTempDirectory("pdsab1").resolve("t").toString
    graft.sources.TemporalTable.write(li, dirOne)
    graft.sources.TemporalTable.write(
      li.withColumn("l_quantity",
        expr(s"CASE WHEN node_key = $oneKey THEN l_quantity + 1 ELSE l_quantity END")),
      dirOne)
    val keys = Seq("node_key")
    def ab(label: String, d: String): Unit = {
      def raw(rev: Int): DataFrame = spark.read.parquet(s"$d/rev=$rev")
      val cmp = raw(1).columns.toSeq.filterNot(keys.contains)
      def manifest(rev: Int) = spark.read.parquet(s"$d/rev=$rev/_manifest")
      // A: the r16 shape — broadcast semi-join per side
      def oldDiff(): Long = {
        val changed = graft.operators.Diff.changedBuckets(manifest(1), manifest(2))
        def slice(df: DataFrame) = df
          .withColumn("__bucket", graft.operators.Diff.bucketExpr(keys, 65536))
          .join(broadcast(changed), Seq("__bucket"), "left_semi")
          .drop("__bucket")
        graft.operators.Diff.diff(slice(raw(1)), slice(raw(2)), keys, cmp).count()
      }
      // B: the r17 shape (TemporalTable.diff routes through it)
      def newDiff(): Long =
        graft.sources.TemporalTable.diff(spark, d, 1, 2).count()
      require(oldDiff() == newDiff(), "A/B row counts must match")
      val a = collection.mutable.ArrayBuffer[Double]()
      val b = collection.mutable.ArrayBuffer[Double]()
      (1 to 5).foreach { _ =>
        var t0 = System.nanoTime(); oldDiff(); a += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); newDiff(); b += (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label old semi-join: ${a.map(t => f"$t%.2f").mkString(", ")} (min ${a.min}%.2f)")
      println(f"[ab] $label new adaptive : ${b.map(t => f"$t%.2f").mkString(", ")} (min ${b.min}%.2f)")
    }
    ab("scattered ", dir)
    ab("single-key", dirOne)
    spark.stop()
  }
}
