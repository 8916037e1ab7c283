package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregateExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("exactDecimalSum matches the decimal-cast fold, ungrouped and grouped") {
    val df = Seq(
      ("a", 1.11), ("a", 2.22), ("a", 0.01),
      ("b", 1e12), ("b", 0.03), ("b", -0.04)
    ).toDF("k", "v").repartition(3)
    val got = df.groupBy("k")
      .agg(AggregateExpressions.exactDecimalSum($"v").as("s"))
      .orderBy("k").select($"s".cast("string")).as[String].collect()
    assert(got.toSeq == Seq("3.34", "999999999999.99"))
    val total = df.agg(AggregateExpressions.exactDecimalSum($"v").cast("double")).as[Double].head()
    assert(total == 3.34 + 999999999999.99)
  }

  test("exact fold has no double accumulation error (0.1 x 100)") {
    val df = Seq.fill(100)(0.1).toDF("v")
    // plain double sum drifts; the decimal fold is exactly 10.00
    val exact = df.agg(AggregateExpressions.exactDecimalSum($"v").cast("string")).as[String].head()
    assert(exact == "10.00")
    val drift = df.agg(sum($"v")).as[Double].head()
    assert(drift != 10.0) // demonstrates why the exact kernel exists
  }

  test("nulls are ignored; empty input sums to zero") {
    val df = Seq(Some(1.5), None, Some(2.5)).toDF("v")
    assert(df.agg(AggregateExpressions.exactDecimalSum($"v").cast("double")).as[Double].head() == 4.0)
    val empty = df.filter($"v" > 100)
      .agg(AggregateExpressions.exactDecimalSum($"v").cast("double")).as[Double].head()
    assert(empty == 0.0)
  }
}
