package graft.plans

import graft.SparkSpec
import graft.operators.Dict
import graft.sources.TemporalTable
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import java.nio.file.Files

/** The dict-surrogate layout composes with the versioned table: encode
  * before [[TemporalTable.write]], and every temporal read — latest
  * snapshot, time travel, the V2 `graft-temporal` source — carries the
  * footer dictionaries, so [[DictAggRule]] fires on historical snapshots
  * exactly as on plain parquet. */
class DictTemporalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-dict-tt").resolve("tbl").toString
    val r1 = Seq((1L, "eng", 10L), (2L, "fra", 20L), (3L, "eng", 30L))
      .toDF("node_key", "lang", "n")
    val r2 = Seq((1L, "eng", 11L), (2L, "deu", 20L), (3L, "eng", 30L),
      (4L, "fra", 40L)).toDF("node_key", "lang", "n")
    TemporalTable.write(Dict.encode(r1, Seq("lang")), p)
    TemporalTable.write(Dict.encode(r2, Seq("lang")), p)
    p
  }

  private def intKeyed(df: org.apache.spark.sql.DataFrame): Boolean = {
    val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    aggs.nonEmpty && aggs.forall(_.groupingExpressions.forall(_.dataType == IntegerType))
  }

  test("rule fires on a time-travel read of an encoded revision") {
    DictAggRule.install(spark)
    val q = TemporalTable.read(spark, path, Some(1))
      .groupBy("lang").agg(sum("n").as("s"))
    assert(intKeyed(q), "grouping did not rewrite onto the code column")
    assert(q.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("eng", 40L), ("fra", 20L)))
    // each revision carries ITS OWN dictionary: rev 2 adds 'deu'
    val q2 = TemporalTable.read(spark, path, Some(2))
      .groupBy("lang").count()
    assert(intKeyed(q2))
    assert(q2.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 2L), ("fra", 1L)))
  }

  test("rule fires through the V2 graft-temporal source") {
    DictAggRule.install(spark)
    val q = spark.read.format("graft-temporal").load(path)
      .groupBy("lang").count()
    assert(q.orderBy("lang").as[(String, Long)].collect().toSeq ==
      Seq(("deu", 1L), ("eng", 2L), ("fra", 1L)))
    assert(intKeyed(q), "V2 read path dropped the dictionary metadata")
  }
}
