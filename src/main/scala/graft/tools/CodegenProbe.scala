package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal reproducer hunt for the "Redefinition of local variable i"
  * codegen failure seen around the vector-index maintain path (falls back
  * to interpreter — correct but slower). Isolates each candidate
  * expression shape with codegen fallback DISABLED so the guilty shape
  * throws instead of degrading silently. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = (0L until 32L).map(i => (i, Seq(i.toDouble, (i * 2).toDouble)))
      .toDF("id", "vec")

    def probe(name: String)(f: => Unit): Unit =
      try { f; println(s"OK   $name") }
      catch { case e: Throwable => println(s"FAIL $name: ${e.getMessage.take(200)}") }

    probe("array equality filter (join shape)") {
      val other = df.select(col("id"), col("vec").as("pv"))
      df.join(other, Seq("id"), "left_outer")
        .filter(col("pv").isNull || col("pv") =!= col("vec")).count()
    }
    probe("assignCells argmin (array_sort of structs of aggregate)") {
      val model = graft.operators.IvfIndex.Model(
        Array(Array(0.0, 0.0), Array(10.0, 20.0), Array(30.0, 60.0)))
      graft.operators.IvfIndex.assignCells(df, model, "vec").count()
    }
    probe("assignCellsWithDistance") {
      val model = graft.operators.IvfIndex.Model(
        Array(Array(0.0, 0.0), Array(10.0, 20.0), Array(30.0, 60.0)))
      graft.operators.IvfIndex.assignCellsWithDistance(df, model, "vec").count()
    }
    probe("transform cast") {
      df.selectExpr("transform(vec, x -> CAST(x AS DOUBLE)) AS v").count()
    }
    probe("full maintain flow (write/create/maintain/search)") {
      val p = java.nio.file.Files.createTempDirectory("graft-cgprobe")
        .resolve("tbl").toString
      def rows(ids: Seq[Long]) = ids.map { id =>
        val theta = (id % 4) * math.Pi / 2.0 + ((id * 37) % 101) / 101.0 * 0.6 - 0.3
        (id, Seq(math.cos(theta), math.sin(theta)))
      }.toDF("node_key", "embedding")
      graft.sources.TemporalTable.write(rows(0L until 64L), p)
      graft.sources.VectorIndex.create(spark, p, "emb", "node_key", "embedding", nLists = 4)
      graft.sources.TemporalTable.write(rows((0L until 64L) ++ Seq(100L, 104L)), p)
      graft.sources.VectorIndex.maintain(spark, p, "emb")
      graft.operators.IvfIndex.searchClustered(spark, s"$p/_vecidx/emb",
        "node_key", "embedding", Array(1.0, 0.0), k = 3, nProbe = 1).count()
    }
    spark.stop()
  }
}
