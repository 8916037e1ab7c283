package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScanCostProbeSpec extends SparkSpec {
  test("probe scan cost split") {
    val prev = sys.props.get("graft.shred.min"); sys.props("graft.shred.min") = "1"
    try {
      val n = 2500000
      val members = spark.range(n.toLong).select(col("id").as("v"),
        (pmod(xxhash64(col("id")), lit(1000L)) / lit(1000.0)).as("w"))
      import spark.implicits._
      val itemsJson = members.orderBy("v").select(to_json(struct(col("v"), col("w")))).as[String].collect().mkString(",")
      val objDoc = s"""{"meta": 1, "items": [$itemsJson]}"""
      val st = new JsoniqRun.Store(spark, java.nio.file.Files.createTempDirectory("probe").toString)
      st.store("c", "obj.jn", objDoc)
      val df = spark.read.parquet(s"${st.baseDir}/c/obj.jn/_shred/r1/s0")
      def t[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val a = f; println(f"$l%-36s ${(System.nanoTime()-t0)/1e9}%6.2f s"); a }
      df.select(to_json(col("member"))).filter(length(col("to_json(member)")) > 100000000).count()
      t("to_json only")(df.select(length(to_json(col("member"))).as("l")).agg(sum("l")).head)
      val kind: JsonPath.ScanKind = JsonPath.CasScan(Some(Seq("/items/[]/w")), JsonPath.CmpOp(">", "0.9"))
      import org.apache.spark.sql.graftbridge.GraftBridge
      def scanCol = GraftBridge.column(JsonMemberScan(
        GraftBridge.expression(to_json(col("member"))), GraftBridge.expression(col("idx")), kind, List("items")))
      df.select(posexplode(scanCol)).count()
      t("to_json + memberscan + explode")(df.select(posexplode(scanCol)).count())
    } finally { prev match { case Some(v) => sys.props("graft.shred.min") = v; case None => sys.props.remove("graft.shred.min") }; () }
  }
}
