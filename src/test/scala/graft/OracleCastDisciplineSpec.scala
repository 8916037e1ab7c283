package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin the integer-SUM cast discipline across every oracle SQL string.
  *
  * DuckDB types `SUM` over an integral column as HUGEINT (int128) while
  * Spark writes int64, and the driver's result hash is type-tagged — an
  * uncast integral SUM aliased straight into an output column hash-fails
  * at the driver even when every value matches (round 7's one red row,
  * `t_time_weighted`). The repo discipline is `CAST(SUM(...) AS BIGINT)`
  * (cf. RelationalQueries b_sum, PipelineQueries d_cdc_share); this spec
  * makes removing any such cast an immediate `sbt test` red instead of a
  * driver-round surprise. tools/check_correctness.py enforces the same
  * contract dynamically (DuckDB-described relation types, spark vs
  * oracle); this is the static half that needs no testdata.
  */
class OracleCastDisciplineSpec extends AnyFunSuite {

  /** `SUM( inner ) AS alias` occurrences where SUM is not wrapped in a
    * CAST and no window `OVER` intervenes — i.e. the aggregate's own
    * (possibly HUGEINT) type reaches the named column. Handles one level
    * of nested parens inside `inner` (CASE WHEN ... END covers the rest
    * of the repo's shapes). */
  private val uncastSumAs =
    """(?i)(?<!CAST\()SUM\(([^()]*(?:\([^()]*\)[^()]*)*)\)\s+AS\s+(\w+)""".r

  /** An inner expression that can only be integral: no float literal, no
    * cast, no division (DuckDB `/` yields DOUBLE), no double/decimal
    * mention. Conservative — a false "integral" forces an explicit CAST,
    * which is always driver-safe. */
  private def looksIntegral(inner: String): Boolean = {
    val u = inner.toUpperCase
    !u.contains(".") && !u.contains("::") && !u.contains("CAST") &&
      !u.contains("/") && !u.contains("DOUBLE") && !u.contains("DECIMAL") &&
      !u.contains("FLOAT")
  }

  /** Aliases that never reach an output column — CTE-internal weights
    * consumed by a comparison/division downstream. Each entry names the
    * query and the reason it is safe. */
  private val cteInternal: Set[(String, String)] = Set(
    // d_simhash / d_simhash_pairs: `SUM(bit * 2 - 1) AS w` lives in a
    // CTE; only the sign of w reaches the output bits, so the HUGEINT
    // width never hashes
    ("d_simhash", "w"),
    ("d_simhash_pairs", "w")
  )

  test("every integral SUM aliased into a column is explicitly CAST") {
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      uncastSumAs.findAllMatchIn(sql).flatMap { m =>
        val (inner, alias) = (m.group(1), m.group(2))
        if (looksIntegral(inner) && !cteInternal((name, alias)))
          Some(s"$name: SUM($inner) AS $alias")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"integral SUM without CAST reaches a named column (DuckDB types it " +
        s"HUGEINT, the driver's type-tagged hash fails):\n  " +
        offenders.mkString("\n  "))
  }

  test("the round-7 red row's oracle carries the cast") {
    val sql = SparkEntry.oracleSql("t_time_weighted")
    assert(sql.toUpperCase.contains("CAST(SUM(VT - VF) AS BIGINT)"),
      "t_time_weighted's total_duration must stay BIGINT-cast")
  }
}
