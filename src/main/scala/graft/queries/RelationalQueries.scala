package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.2-§2.7): filters, projections,
  * joins (equi / semi / anti / theta), aggregation shapes mirroring the
  * reference's vectorized kernels
  * (bundles/sirix-query/src/main/java/io/sirix/query/scan/SirixVectorizedExecutor.java),
  * window functions, sorts/limits, set ops, rollup/cube.
  *
  * Determinism conventions for the DuckDB-oracle hash compare:
  *  - money aggregates go through DECIMAL(18,2) so the fold is exact, then a
  *    single cast to DOUBLE (identical nearest-double in both engines);
  *  - every result carries a total ORDER BY on its key columns;
  *  - output column names are aliased identically in Spark and SQL.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  // exact-decimal sum of a 2dp money column, emitted as double
  private def dsum(c: String, alias: String) =
    expr(s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)").as(alias)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-H Q1 shape: filter + multi-aggregate group-by ----
    "q1_agg" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity", "sum_qty"),
          dsum("l_extendedprice", "sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("sum_disc_price"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- the nine duck_bench shapes (BASELINE.md) on lineitem ----
    "b_filter_count" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 40 && col("l_discount") > 0.02)
        .agg(count(lit(1)).as("cnt"))
    },
    "b_groupby" -> { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt")).orderBy("l_returnflag")
    },
    // l_quantity is integral (TPC-H 1..50) — BIGINT summation is exact,
    // deterministic AND ~2x faster than the decimal fold
    "b_sum" -> { (s, d) =>
      t(s, d, "lineitem")
        .agg(expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)").as("sum_qty"))
    },
    "b_avg" -> { (s, d) =>
      t(s, d, "lineitem")
        .agg(expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)").as("avg_qty"))
    },
    "b_minmax" -> { (s, d) =>
      t(s, d, "lineitem").agg(min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))
    },
    "b_groupby_multi" -> { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt")).orderBy("l_returnflag", "l_linestatus")
    },
    "b_filter_groupby" -> { (s, d) =>
      t(s, d, "lineitem").filter(col("l_discount") > 0.05)
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt")).orderBy("l_returnflag")
    },
    "b_count_distinct" -> { (s, d) =>
      t(s, d, "lineitem").agg(countDistinct(col("l_partkey")).as("cnt_d"))
    },
    // point lookup by stable identity (jn:select-json-item analog) —
    // the predicate pushes into the parquet scan
    "q_select_item" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") === 42 && col("l_linenumber") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    },
    // exact median / quantiles (sort-based percentile with linear interp)
    "q_percentile" -> { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag")
    },
    "b_compound_and" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_quantity") < 50 && col("l_discount") > 0.02)
        .agg(count(lit(1)).as("cnt"))
    },

    // ---- joins ----
    // TPC-H Q3 shape: 3-way join, computed-aggregate group-by, top-k.
    // customer is small → broadcast; lineitem⋈orders shuffles on orderkey.
    "q3_topk" -> { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"))
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },
    // TPC-H Q5 shape: 6-way join with dims broadcast, revenue per nation.
    "q5_join" -> { (s, d) =>
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val supp = t(s, d, "supplier")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"))
        .orderBy("n_name")
    },
    "q_semi_join" -> { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    "q_anti_join" -> { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    // theta (inequality) join: account balances within 1.0 of each other
    "q_theta_join" -> { (s, d) =>
      val c = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      c.join(broadcast(sup),
          col("s_acctbal") > col("c_acctbal") - 1.0 && col("s_acctbal") < col("c_acctbal") + 1.0)
        .select("c_custkey", "s_suppkey").orderBy("c_custkey", "s_suppkey")
    },

    // ---- window functions ----
    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    },
    "q_window_running" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    },
    "q_window_lag" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .select("o_custkey", "o_orderkey", "prev_price")
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- sorts / paging ----
    "q_order_limit_offset" -> { (s, d) =>
      t(s, d, "orders").orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(5).limit(20)
    },

    // ---- set operations (SURVEY.md §2.7, ConcurrentUnion/Intersect/ExceptAxis) ----
    "q_set_union" -> { (s, d) =>
      t(s, d, "orders").select(col("o_custkey").as("k"))
        .union(t(s, d, "customer").filter(col("c_acctbal") < 0).select(col("c_custkey").as("k")))
        .distinct().orderBy("k")
    },
    "q_set_intersect" -> { (s, d) =>
      t(s, d, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")
    },
    "q_set_except" -> { (s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    // ---- rollup / cube / grouping sets (parity-plus, SURVEY.md §2.4) ----
    "q_rollup" -> { (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("gid"))
        .orderBy("gid", "flag", "status")
    },
    "q_cube" -> { (s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("gid"))
        .orderBy("gid", "flag", "status")
    },

    // ---- dictionary-surrogate aggregation (Dict layout + DictAggRule):
    // the table is rewritten through Dict.writeEncoded, the rule turns the
    // string-keyed group-by into an int32-code group-by (scan never decodes
    // the strings), and the oracle checks the answer is bit-identical to a
    // plain GROUP BY over the original parquet ----
    "q_dict_groupby" -> { (s, d) =>
      val enc = java.nio.file.Files.createTempDirectory("graft-dictq").toString + "/docs"
      graft.operators.Dict.writeEncoded(
        t(s, d, "documents").select("doc_id", "lang", "source", "n_chars"),
        Seq("lang", "source"), enc)
      graft.plans.DictAggRule.install(s)
      s.read.parquet(enc)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .orderBy("lang", "source")
    },

    // The stable-dictionary variant over a MULTI-revision history frame:
    // two revisions written with `dictCols` share an append-only dictionary
    // (rev 1 covers only langs >= 'es', rev 2 appends the rest AFTER —
    // codes are deliberately NOT value-ordered), and the rule's per-file
    // footer verification finds them prefix-compatible, so the history
    // aggregation runs on int32 codes and decodes through the longest
    // dictionary. The oracle recomputes the same two-revision union from
    // the original parquet — one mis-decoded code would shift a whole
    // group.
    "q_dict_history" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-dicth").toString + "/docs"
      val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars")
      graft.sources.TemporalTable.write(docs.filter(col("lang") >= "es"), p,
        dictCols = Seq("lang"))
      graft.sources.TemporalTable.write(docs, p, dictCols = Seq("lang"))
      graft.plans.DictAggRule.install(s)
      s.read.format("graft-temporal").option("allRevisions", true).load(p)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    },

    // ---- stats-sidecar aggregate fold (AggFromStatsRule): the writer
    // records per-column count/nulls/sum/min/max + exact NDV in a _stats
    // sidecar, and the unfiltered aggregate below folds to a one-row
    // LocalRelation — zero tasks, zero data bytes. The oracle recomputes
    // every statistic from the source table: a stale or mis-merged
    // sidecar value would hash-mismatch ----
    "q_stats_fold" -> { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-statsq").toString + "/t"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .write.parquet(dir)
      graft.sources.StatsSidecar.write(s, dir,
        ndvCols = Seq("l_returnflag", "l_linestatus"))
      graft.plans.AggFromStatsRule.install(s)
      s.read.parquet(dir).agg(
        sum("l_linenumber").as("sum_ln"),
        avg("l_linenumber").as("avg_ln"),
        min("l_linenumber").as("min_ln"),
        max("l_linenumber").as("max_ln"),
        count(lit(1)).as("n_rows"),
        count(col("l_linenumber")).as("n_ln"),
        countDistinct(col("l_returnflag")).as("n_flags"),
        countDistinct(col("l_linestatus")).as("n_status"))
    },

    // The grouped fold: the sidecar records a per-group section for
    // l_returnflag, so the whole GROUP BY answer (3 groups) comes from
    // the sidecar — the oracle recomputes every group from the raw table
    "q_stats_group" -> { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-statsq-grp").toString + "/t"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .write.parquet(dir)
      graft.sources.StatsSidecar.write(s, dir,
        groupCols = Seq(Seq("l_returnflag")))
      graft.plans.AggFromStatsRule.install(s)
      s.read.parquet(dir).groupBy("l_returnflag").agg(
        sum("l_linenumber").as("sum_ln"),
        avg("l_linenumber").as("avg_ln"),
        min("l_linenumber").as("min_ln"),
        max("l_linenumber").as("max_ln"),
        count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // The filtered fold (micro-cube serving): filter columns + grouping
    // columns all lie inside the recorded (l_returnflag, l_linestatus)
    // tuple, so the predicate evaluates over ≤6 recorded entries
    // driver-side and the survivors merge by group — zero tasks. The
    // oracle recomputes from the raw table
    "q_stats_cube_filter" -> { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-statsq-cube").toString + "/t"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .write.parquet(dir)
      graft.sources.StatsSidecar.write(s, dir,
        groupCols = Seq(Seq("l_returnflag", "l_linestatus")))
      graft.plans.AggFromStatsRule.install(s)
      s.read.parquet(dir)
        .filter(col("l_returnflag") =!= "N")
        .groupBy("l_linestatus").agg(
          count(lit(1)).as("n_rows"),
          sum("l_linenumber").as("sum_ln"))
        .orderBy("l_linestatus")
    },

    // Per-group NDV of a NON-tuple column ("distinct orders per flag" —
    // the distinct-users-per-dept monitoring shape): recorded exactly at
    // write time, served only because section entries map 1:1 to output
    // groups. The oracle recomputes every group's distinct count raw
    "q_stats_group_ndv" -> { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-statsq-gndv").toString + "/t"
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .write.parquet(dir)
      graft.sources.StatsSidecar.write(s, dir,
        ndvCols = Seq("l_orderkey"), groupCols = Seq(Seq("l_returnflag")))
      graft.plans.AggFromStatsRule.install(s)
      s.read.parquet(dir).groupBy("l_returnflag").agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // The staleness bail, oracle-checked: rows appended AFTER the sidecar
    // was written make the fingerprint stale, so the rule must fall back
    // to the scan — the answer covers the appended rows or the hash
    // mismatches
    "q_stats_stale" -> { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-statsq-stale").toString + "/t"
      val proj = t(s, d, "lineitem").select("l_orderkey", "l_linenumber")
      proj.write.parquet(dir)
      graft.sources.StatsSidecar.write(s, dir)
      proj.filter(col("l_orderkey") <= 1000).write.mode("append").parquet(dir)
      graft.plans.AggFromStatsRule.install(s)
      s.read.parquet(dir).agg(
        sum("l_linenumber").as("sum_ln"), count(lit(1)).as("n_rows"))
    },

    // The persisted stats policy end-to-end over a MULTI-REVISION
    // temporal table: revision 1 opts in (withStats + an NDV column),
    // revision 2 is a PLAIN write that must inherit the recipe. The
    // snapshot aggregate folds from revision 2's inherited sidecar
    // (incl. the NDV); the history aggregate merges both revisions'
    // sidecars additively. The oracle recomputes everything from the
    // raw table — a mis-inherited or mis-merged value hash-mismatches
    "q_stats_temporal" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-statsq-temp")
        .toString + "/tbl"
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      graft.sources.TemporalTable.write(li.filter(col("l_orderkey") <= 3000), p,
        withStats = true, statsNdvCols = Seq("l_returnflag"))
      graft.sources.TemporalTable.write(li, p) // inherits the stats policy
      graft.plans.AggFromStatsRule.install(s)
      val snap = s.read.format("graft-temporal").load(p).agg(
        sum("l_linenumber").as("snap_sum"), count(lit(1)).as("snap_n"),
        min("l_linenumber").as("snap_min"), max("l_linenumber").as("snap_max"),
        countDistinct(col("l_returnflag")).as("snap_flags"))
      val hist = s.read.format("graft-temporal")
        .option("allRevisions", true).load(p)
        .agg(sum("l_linenumber").as("hist_sum"), count(lit(1)).as("hist_n"))
      snap.crossJoin(hist)
    },

    // Schema evolution × stats sidecar: revision 1 predates l_returnflag,
    // revision 2 adds it (both withStats). The union-schema history
    // aggregate folds — the pre-column revision contributes an all-null
    // ColStats, exactly what the union-schema read serves — and the
    // snapshot NDV folds single-dir. The oracle recomputes both frames
    // raw: a mis-merged all-null era (e.g. counting the old rows into
    // count(l_returnflag)) hash-mismatches
    "q_stats_evolved" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-statsq-evo")
        .toString + "/tbl"
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      graft.sources.TemporalTable.write(
        li.select(col("l_orderkey"), col("l_linenumber"))
          .filter(col("l_orderkey") <= 3000), p, withStats = true)
      graft.sources.TemporalTable.write(li, p,
        withStats = true, statsNdvCols = Seq("l_returnflag"))
      graft.plans.AggFromStatsRule.install(s)
      val hist = s.read.format("graft-temporal")
        .option("allRevisions", true).load(p)
        .agg(sum("l_linenumber").as("hist_sum"), count(lit(1)).as("hist_n"),
          count(col("l_returnflag")).as("hist_flag_n"),
          min("l_linenumber").as("hist_min"), max("l_linenumber").as("hist_max"))
      val snap = s.read.format("graft-temporal").load(p)
        .agg(countDistinct(col("l_returnflag")).as("snap_flags"),
          sum("l_linenumber").as("snap_sum"))
      snap.crossJoin(hist)
    },

    // Projection-index serving (reference projection/ProjectionIndexBuilder
    // .java:52): a declared (l_orderkey, l_quantity) projection over a
    // 2-revision table serves a covering aggregate — the closure FAILS
    // unless the executed plan reads the `_proj` sidecar and never the
    // base table's data files; the oracle recomputes from raw lineitem,
    // so a stale or fractional projection hash-mismatches
    "q_projection_serve" -> { (s, d) =>
      val p = java.nio.file.Files.createTempDirectory("graft-projq")
        .toString + "/tbl"
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
      graft.sources.TemporalTable.write(
        li.filter(col("l_orderkey") <= 3000), p)
      graft.sources.ProjectionIndex.create(s, p, "oq",
        Seq("l_orderkey", "l_quantity"))
      graft.sources.TemporalTable.write(li, p)
      graft.sources.ProjectionIndex.maintain(s, p, "oq")
      val served = graft.sources.ProjectionIndex.readAuto(
        s, p, Seq("l_orderkey", "l_quantity"), Some(2))
      val plan = served.queryExecution.executedPlan.toString
      require(plan.contains("_proj"),
        s"projection did not serve the covering read:\n$plan")
      require(!plan.contains(s"$p/rev="),
        s"covering read scanned the base table's data files:\n$plan")
      served.agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // ---- nested data: JSON field extraction, array ops (SURVEY.md §2.2) ----
    "q_json_extract" -> { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
        .orderBy("event_id")
    },
    "q_array_elem" -> { (s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    },
    // The slice itself is `slice(embedding, 1, 4)`; the result is serialized
    // to one canonical string (decimal-rendered, comma-joined) because the
    // driver's pandas hash-compare cannot factorize raw array cells. The
    // decimal cast renders identically in Spark and DuckDB.
    "q_array_slice" -> { (s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"),
          concat_ws(",", expr(
            "transform(slice(embedding, 1, 4), x -> CAST(CAST(x AS DECIMAL(14,4)) AS STRING))"))
            .as("head4"))
        .orderBy("vec_id")
    },
    "q_explode" -> { (s, d) =>
      t(s, d, "embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"), col("col").cast("double").as("val"))
        .orderBy("vec_id", "pos")
    },
    // ---- statistics layer (reference stats/Histogram.java analog) ----
    "q_column_stats" -> { (s, d) =>
      graft.operators.Stats.columnStats(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_name")
    },
    "q_histogram" -> { (s, d) =>
      graft.operators.Stats.equiWidthHistogram(t(s, d, "lineitem"),
          "l_extendedprice", 16)
        .orderBy("bucket")
    },
    "q_quantiles" -> { (s, d) =>
      graft.operators.Stats.quantiles(t(s, d, "lineitem"), "l_extendedprice",
          (1 to 9).map(_ / 10.0))
        .orderBy("q")
    },
    "q_corr" -> { (s, d) =>
      graft.operators.Stats.pearson(t(s, d, "lineitem"), "l_quantity", "l_extendedprice")
    }
  )

  val oracles: Map[String, String] = Map(
    // the rewrite must not change a single value vs the plain formulation:
    // the oracle ignores the encoded table entirely and aggregates the
    // original parquet (SUM cast — DuckDB SUM(BIGINT) returns HUGEINT)
    "q_dict_groupby" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  COUNT(DISTINCT doc_id) AS n_distinct
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_dict_history" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT lang, n_chars FROM documents WHERE lang >= 'es'
        |      UNION ALL SELECT lang, n_chars FROM documents) u
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b_filter_count" ->
      "SELECT COUNT(*) AS cnt FROM lineitem WHERE l_quantity > 40 AND l_discount > 0.02",
    "b_groupby" ->
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "b_sum" ->
      "SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty FROM lineitem",
    "b_avg" ->
      "SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty FROM lineitem",
    "b_minmax" ->
      "SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty FROM lineitem",
    "b_groupby_multi" ->
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "b_filter_groupby" ->
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem WHERE l_discount > 0.05 GROUP BY l_returnflag ORDER BY l_returnflag",
    "b_count_distinct" ->
      "SELECT COUNT(DISTINCT l_partkey) AS cnt_d FROM lineitem",
    "q_stats_fold" ->
      """SELECT CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln,
        |  AVG(l_linenumber) AS avg_ln,
        |  MIN(l_linenumber) AS min_ln, MAX(l_linenumber) AS max_ln,
        |  COUNT(*) AS n_rows, COUNT(l_linenumber) AS n_ln,
        |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
        |  CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_status
        |FROM lineitem""".stripMargin,
    "q_stats_group" ->
      """SELECT l_returnflag, CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln,
        |  AVG(l_linenumber) AS avg_ln,
        |  MIN(l_linenumber) AS min_ln, MAX(l_linenumber) AS max_ln,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats_cube_filter" ->
      """SELECT l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
        |FROM lineitem WHERE l_returnflag <> 'N'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_stats_group_ndv" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats_stale" ->
      """SELECT CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln, COUNT(*) AS n_rows
        |FROM (SELECT l_orderkey, l_linenumber FROM lineitem
        |      UNION ALL
        |      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey <= 1000)""".stripMargin,
    "q_stats_temporal" ->
      """SELECT * FROM
        |(SELECT CAST(SUM(l_linenumber) AS BIGINT) AS snap_sum, COUNT(*) AS snap_n,
        |        MIN(l_linenumber) AS snap_min, MAX(l_linenumber) AS snap_max,
        |        CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS snap_flags
        | FROM lineitem) a
        |CROSS JOIN
        |(SELECT CAST(SUM(l_linenumber) AS BIGINT) AS hist_sum, COUNT(*) AS hist_n
        | FROM (SELECT l_linenumber FROM lineitem WHERE l_orderkey <= 3000
        |       UNION ALL SELECT l_linenumber FROM lineitem) u) b""".stripMargin,
    "q_stats_evolved" ->
      """SELECT * FROM
        |(SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS snap_flags,
        |        CAST(SUM(l_linenumber) AS BIGINT) AS snap_sum
        | FROM lineitem) a
        |CROSS JOIN
        |(SELECT CAST(SUM(l_linenumber) AS BIGINT) AS hist_sum, COUNT(*) AS hist_n,
        |        COUNT(l_returnflag) AS hist_flag_n,
        |        MIN(l_linenumber) AS hist_min, MAX(l_linenumber) AS hist_max
        | FROM (SELECT l_linenumber, CAST(NULL AS VARCHAR) AS l_returnflag
        |         FROM lineitem WHERE l_orderkey <= 3000
        |       UNION ALL SELECT l_linenumber, l_returnflag FROM lineitem) u) b""".stripMargin,
    "q_projection_serve" ->
      """SELECT CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem""".stripMargin,
    "q_select_item" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey = 42 AND l_linenumber = 1""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "b_compound_and" ->
      "SELECT COUNT(*) AS cnt FROM lineitem WHERE l_quantity > 30 AND l_quantity < 50 AND l_discount > 0.02",
    "q3_topk" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_theta_join" ->
      """SELECT c_custkey, s_suppkey FROM customer, supplier
        |WHERE s_acctbal > c_acctbal - 1.0 AND s_acctbal < c_acctbal + 1.0
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_order_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5""".stripMargin,
    "q_set_union" ->
      """SELECT o_custkey AS k FROM orders
        |UNION
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |ORDER BY k""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS cnt, GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, flag, status""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS cnt, GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, flag, status""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_array_elem" ->
      """SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS e1, CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_array_slice" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding[1:4],
        |    x -> CAST(CAST(x AS DECIMAL(14,4)) AS VARCHAR)), ',') AS head4
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_explode" ->
      """SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS val
        |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        |WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin,
    "q_column_stats" ->
      """SELECT col_name, n_rows, n_nonnull, ndv, min_d, max_d FROM (
        |  SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(l_quantity) AS n_nonnull, COUNT(DISTINCT l_quantity) AS ndv,
        |    CAST(MIN(l_quantity) AS DOUBLE) AS min_d, CAST(MAX(l_quantity) AS DOUBLE) AS max_d
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
        |    COUNT(DISTINCT l_extendedprice),
        |    CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
        |    CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
        |  FROM lineitem)
        |ORDER BY col_name""".stripMargin,
    "q_histogram" ->
      """WITH mm AS (
        |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
        |    (MAX(l_extendedprice) - MIN(l_extendedprice)) / 16 AS w
        |  FROM lineitem),
        |b AS (
        |  SELECT CAST(LEAST(FLOOR((l_extendedprice - mm.lo) / mm.w), 15) AS BIGINT) AS bucket
        |  FROM lineitem, mm WHERE l_extendedprice IS NOT NULL)
        |SELECT bucket, ROUND(mm.lo + bucket * mm.w, 4) AS lo,
        |  ROUND(mm.lo + (bucket + 1) * mm.w, 4) AS hi, COUNT(*) AS cnt
        |FROM b, mm GROUP BY bucket, mm.lo, mm.w ORDER BY bucket""".stripMargin,
    "q_quantiles" ->
      """SELECT UNNEST(CAST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9] AS DOUBLE[])) AS q,
        |  UNNEST(list_transform(
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE),
        |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |    x -> ROUND(x, 4))) AS value
        |FROM lineitem ORDER BY q""".stripMargin,
    "q_corr" ->
      """WITH s AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)
        |SELECT n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 4) AS r
        |FROM s""".stripMargin
  )
}
