package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: build a vanilla session (no graft-specific
  * confs) and check `SparkEntry.entry` returns rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
