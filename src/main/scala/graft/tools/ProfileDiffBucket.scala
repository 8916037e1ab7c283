package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Before/after evidence harness for the bucket-clustered snapshot layout
  * (round 17): times TemporalTable.write and the two adjacent-diff shapes
  * — the bench's scattered 1% update and the reference-style single-key
  * change — and dumps the diff's formatted plan for plans/r17. */
object ProfileDiffBucket {
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

    def timed(label: String)(body: => Any): Unit = {
      body // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pdb] $label: ${ts.map(t => f"$t%.2f").mkString(", ")} (min ${ts.min}%.2f)")
    }

    // write cost (the guard: write-path entries must stay within noise)
    timed("write snapshot") {
      val d = java.nio.file.Files.createTempDirectory("pdb-w").resolve("t").toString
      graft.sources.TemporalTable.write(li, d)
    }

    // scattered update: ~1% of rows across ~9% of buckets (bench shape)
    val dirScatter = java.nio.file.Files.createTempDirectory("pdb-s").resolve("t").toString
    graft.sources.TemporalTable.write(li, dirScatter)
    graft.sources.TemporalTable.write(
      li.withColumn("l_quantity",
        expr("CASE WHEN l_orderkey % 100 = 0 THEN l_quantity + 1 ELSE l_quantity END")),
      dirScatter)
    println(s"[pdb] scattered diff rows = " +
      graft.sources.TemporalTable.diff(spark, dirScatter, 1, 2).count())
    timed("diff adjacent scattered (w_diff_adjacent shape)") {
      graft.sources.TemporalTable.diff(spark, dirScatter, 1, 2).count()
    }

    // single-key update: 1 changed bucket (the reference's adjacent-
    // revision posture — a handful of nodes change per commit). The key
    // must actually exist (monotonic ids are partition-indexed, so small
    // literals need not be assigned).
    val oneKey = li.agg(min(col("node_key"))).head().getLong(0)
    val dirOne = java.nio.file.Files.createTempDirectory("pdb-1").resolve("t").toString
    graft.sources.TemporalTable.write(li, dirOne)
    graft.sources.TemporalTable.write(
      li.withColumn("l_quantity",
        expr(s"CASE WHEN node_key = $oneKey THEN l_quantity + 1 ELSE l_quantity END")),
      dirOne)
    println(s"[pdb] single-key diff rows = " +
      graft.sources.TemporalTable.diff(spark, dirOne, 1, 2).count())
    timed("diff adjacent single-key (1-bucket change)") {
      graft.sources.TemporalTable.diff(spark, dirOne, 1, 2).count()
    }

    println("===PLAN diff single-key===")
    graft.sources.TemporalTable.diff(spark, dirOne, 1, 2).explain("formatted")
    println("===PLAN diff scattered===")
    graft.sources.TemporalTable.diff(spark, dirScatter, 1, 2).explain("formatted")
    spark.stop()
  }
}
