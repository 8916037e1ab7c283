package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.11): the JSONiq/XQuery F&O library
  * the reference inherits from brackit, re-expressed as Spark built-ins —
  * strings, math, dates, struct/array navigation, quantified aggregates,
  * grouping sets, serialization. Constants avoid cross-engine FP libm
  * differences (sqrt/abs/floor are IEEE-exact; exp/ln are not relied on).
  */
object FunctionQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> { (s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("u"),
          lower(col("p_brand")).as("l"),
          substring(col("p_name"), 1, 5).as("sub"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
          length(col("p_name")).as("len"),
          lpad(col("p_brand"), 12, "_").as("pad"),
          instr(col("p_type"), "a").cast("long").as("pos"),
          expr("left(p_name, 3)").as("l3"),
          regexp_extract(col("p_type"), "([a-z]+)", 1).as("firstword"),
          trim(col("p_name")).as("trimmed"))
        .orderBy("p_partkey")
    },
    "q_math_funcs" -> { (s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("a"),
          floor(col("p_size") / 7.0).cast("long").as("fl"),
          ceil(col("p_size") / 7.0).cast("long").as("ce"),
          sqrt(col("p_size").cast("double")).as("sq"),
          (col("p_size") % 5).as("md"),
          (col("p_size") * col("p_size")).as("p2"),
          greatest(col("p_size"), lit(10)).as("gr"),
          least(col("p_size"), lit(40)).as("le"))
        .orderBy("p_partkey")
    },
    "q_date_funcs" -> { (s, d) =>
      t(s, d, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("since_epoch"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy("o_orderkey")
    },
    // schema-drifting JSON via Spark 4 VariantType (SURVEY "hard parts"):
    // parse once, navigate with variant_get — no static schema needed
    "q_variant_json" -> { (s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .orderBy("event_id")
    },
    // regex predicates + extraction (fn:matches / fn:replace)
    "q_regex_funcs" -> { (s, d) =>
      t(s, d, "part").select(
          col("p_partkey"),
          col("p_type").rlike("^[a-m]").as("m1"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("lastword"))
        .orderBy("p_partkey")
    },
    // union all preserves duplicates (vs q_set_union's dedup)
    "q_union_all" -> { (s, d) =>
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k"))
      o.unionAll(o).groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k")
    },
    // explicit grouping sets (parity-plus over rollup/cube)
    "q_grouping_sets" -> { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
          |  COUNT(*) AS cnt
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY flag, status""".stripMargin)
    },
    // struct construction + field deref (object deref $o.field, §2.2)
    "q_struct_nav" -> { (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal"),
            struct(col("c_mktsegment").as("seg")).as("meta")).as("obj"))
        .select(col("c_custkey"),
          col("obj.name").as("nm"),
          col("obj.bal").as("bal"),
          col("obj.meta.seg").as("seg"))   // nested deref = descendant path
        .orderBy("c_custkey")
    },
    // parent/ancestor axis re-expressed relationally (§2.2 structural axes):
    // supplier → nation (parent) → region (ancestor)
    "q_nav_parent" -> { (s, d) =>
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("n_name").as("parent_name"), col("r_name").as("ancestor_name"))
        .orderBy("s_suppkey")
    },
    // quantified some/every (§2.3 semi/anti row): bool_and / bool_or
    "q_quantified" -> { (s, d) =>
      t(s, d, "orders").groupBy("o_custkey")
        .agg(expr("bool_and(o_totalprice > 50000)").as("every_big"),
          expr("bool_or(o_orderstatus = 'F')").as("some_finished"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")
    },
    // approximate count-distinct (HLL). The estimate itself is
    // engine-specific, so the output carries what IS portable: the exact
    // cardinality plus a bounded-relative-error assertion over the HLL
    // estimate (rsd 0.05 → assert within 3σ = 15%); the oracle recomputes
    // the exact count and pins the assertion to true.
    "q_approx_distinct" -> { (s, d) =>
      t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.15).as("within_bounds"))
    },
    // descendant deref $o=>>field (§2.2): schema-driven any-depth search
    "q_deref_descendant" -> { (s, d) =>
      val base = t(s, d, "customer")
        .select(col("c_custkey"),
          struct(
            struct(col("c_acctbal").as("bal")).as("inner"),
            col("c_name").as("name")).as("doc"))
      base.select(col("c_custkey"),
          graft.operators.Nested.derefDescendant(base, "bal").as("bal"),
          graft.operators.Nested.derefDescendant(base, "name").as("nm"))
        .orderBy("c_custkey")
    },
    // descendant deref through ARRAYS (§2.2 — the reference's
    // DerefDescendantExpr searches array members too): doc carries
    // array<struct<array<struct>>> branches plus a struct branch; `v`
    // matches once per element, flattened in document order
    "q_deref_descendant_array" -> { (s, d) =>
      val nested = graft.operators.Nested
      val base = t(s, d, "customer")
        .select(col("c_custkey"),
          struct(
            array(
              struct(array(struct(col("c_acctbal").as("v")),
                struct((col("c_acctbal") * 2).as("v"))).as("lines")),
              struct(array(struct((col("c_acctbal") * 3).as("v"))).as("lines"))
            ).as("blocks"),
            struct(lit(0.0).as("v")).as("foot")).as("doc"))
      base.select(col("c_custkey"),
          nested.derefDescendant(base, "v").as("first_v"),
          concat_ws(",", transform(nested.derefDescendantAll(base, "v"),
            x => x.cast("decimal(18,2)").cast("string"))).as("all_v"))
        .orderBy("c_custkey")
    },
    // XML shredder (§2.1): per-row XML documents → node table with
    // document-order keys and DeweyID ordpaths
    "q_xml_shred" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<nation key=\""), col("n_nationkey"), lit("\"><name>"),
          col("n_name"), lit("</name></nation>")).as("xml"))
      graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
        .select(col("doc_id"), col("node_seq"), col("kind"),
          coalesce(col("name"), lit("")).as("name"),
          coalesce(col("value"), lit("")).as("value"),
          concat_ws(".", col("ordpath")).as("path"))
        .orderBy("doc_id", "node_seq")
    },
    // XPath axes over shredded XML (§2.2): parent via key equi-join,
    // sibling position via ordpath — end-to-end over generated documents
    "q_xml_axes" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<nation><name>"), col("n_name"), lit("</name><region>"),
          col("n_regionkey"), lit("</region></nation>")).as("xml"))
      val nodes = graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
      val elems = nodes.filter(col("kind") === "element" && col("parent_key").isNotNull)
      val parents = nodes.select(col("node_key").as("parent_key"),
        col("name").as("parent_name"))
      elems.join(parents, "parent_key")
        .select(col("doc_id"), col("name"), col("parent_name"),
          // preceding-sibling count = last ordpath component - 1
          (element_at(col("ordpath"), size(col("ordpath"))) - 1).as("n_preceding"))
        .orderBy("doc_id", "name")
    },
    // shred → serialize round trip (XmlShredder.serialize, the inverse of
    // the shredder — reference service/xml/serialize): the reconstructed
    // document must equal the input byte-for-byte. The fixture carries a
    // top-level comment, an in-element comment, a processing instruction,
    // a namespace declaration and prefixed names — first-class node kinds
    // (reference CommentNode.java / PINode.java / NamespaceNode.java),
    // NOT dropped by the shredder.
    "q_xml_roundtrip" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<!--hdr--><nation xmlns:g=\"urn:g\" key=\""),
          col("n_nationkey"),
          lit("\"><?audit level=\"2\"?><g:name>"), col("n_name"),
          lit("</g:name><!--trail:"), col("n_regionkey"),
          lit("--></nation>")).as("xml"))
      val nodes = graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
      graft.sources.XmlShredder.serialize(nodes).orderBy("doc_id")
    },
    // following / preceding axes (§2.2 — reference axis/FollowingAxis.java:33,
    // PrecedingAxis.java:34): XPath semantics — nodes strictly after/before
    // the anchor in document order, excluding the anchor's own
    // descendants/ancestors and attribute nodes. Pure ordpath expressions
    // (docOrderCmp + prefix ancestry) over the shredded node table: the
    // axis is a per-document column computation after one equi-join on the
    // doc id — no tree walk, no cross-document shuffle.
    "q_xml_following" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<nation><meta>M</meta><name>"), col("n_name"),
          lit("</name><region><id>"), col("n_regionkey"),
          lit("</id></region></nation>")).as("xml"))
      val nodes = graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
      val anchor = nodes
        .filter(col("kind") === "element" && col("name") === "name")
        .select(col("doc_id"), col("ordpath").as("a_path"))
      val op = graft.operators.Ordpath
      nodes.filter(col("kind") =!= "attribute")
        .join(anchor, "doc_id")
        .groupBy("doc_id").agg(
          sum(when(op.docOrderCmp(col("a_path"), col("ordpath")) < 0 &&
            !op.isAncestor(col("a_path"), col("ordpath")), 1L).otherwise(0L))
            .as("n_following"),
          sum(when(op.docOrderCmp(col("ordpath"), col("a_path")) < 0 &&
            !op.isAncestor(col("ordpath"), col("a_path")), 1L).otherwise(0L))
            .as("n_preceding"))
        .orderBy("doc_id")
    },
    // level-order traversal with depth limit (sdb:level-order —
    // function/sdb/trx/LevelOrder.java:36 over axis/LevelOrderAxis.java):
    // BFS rank = ordering by (level, pre-order seq). Pre-order preserves
    // relative document order within a level, so the whole traversal is
    // ONE window over the shredded node table — no tree walk, and the
    // window partitions by document, so at 100 TB each doc sorts its own
    // (tiny) node set with no cross-document shuffle beyond the hash.
    "q_level_order" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<nation key=\""), col("n_nationkey"), lit("\"><name>"),
          col("n_name"), lit("</name><region><id>"), col("n_regionkey"),
          lit("</id></region></nation>")).as("xml"))
      val nodes = graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
      val maxLevel = 3 // LevelOrder's depth argument (FunUtil depth param)
      import org.apache.spark.sql.expressions.Window
      nodes.filter(size(col("ordpath")) <= maxLevel)
        .withColumn("visit_rank", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(size(col("ordpath")), col("node_seq"))))
        .select(col("doc_id"), col("visit_rank"),
          size(col("ordpath")).as("level"), col("kind"),
          coalesce(col("name"), lit("")).as("name"),
          coalesce(col("value"), lit("")).as("value"))
        .orderBy("doc_id", "visit_rank")
    },
    // document-order sort (sdb:sort — function/sdb/SortByDocOrder.java):
    // ordpath arrays ORDER as document order (lexicographic, ancestor
    // before descendant), so re-establishing doc order over an arbitrarily
    // shuffled node set is a plain column sort — Catalyst's native array
    // ordering, codegen'd, no comparator UDF. The emitted `ordered_ok`
    // column additionally pins Ordpath.docOrderCmp against the same order:
    // every node's predecessor under the sort compares strictly before it.
    "q_doc_order_sort" -> { (s, d) =>
      val xml = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("doc_id"),
        concat(lit("<nation key=\""), col("n_nationkey"), lit("\"><name>"),
          col("n_name"), lit("</name><region><id>"), col("n_regionkey"),
          lit("</id></region></nation>")).as("xml"))
      val nodes = graft.sources.XmlShredder.shred(xml, "doc_id", "xml")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy(col("ordpath"))
      nodes
        .withColumn("doc_order_rank", row_number().over(w))
        .withColumn("ordered_ok",
          coalesce(graft.operators.Ordpath.docOrderCmp(
            lag(col("ordpath"), 1).over(w), col("ordpath")) < 0, lit(true)))
        .select(col("doc_id"), col("doc_order_rank"), col("node_seq"),
          col("kind"), coalesce(col("name"), lit("")).as("name"),
          col("ordered_ok"))
        .orderBy("doc_id", "doc_order_rank")
    },
    // depth-limited serialization (sdb:serialize maxLevel, §2.6)
    "q_serialize_limited" -> { (s, d) =>
      val base = t(s, d, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("name"),
            struct(col("n_regionkey").as("rk")).as("meta")).as("doc"))
      base.select(col("n_nationkey"),
          graft.operators.Nested.toJsonLimited(base, "doc", 1).as("js"))
        .orderBy("n_nationkey")
    },
    // child-limited serialization (sdb:serialize maxChildNodes, §2.6):
    // every array capped to its first 2 elements at any depth
    "q_serialize_children" -> { (s, d) =>
      val base = t(s, d, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("name"),
            array(col("n_regionkey"), col("n_regionkey") + 1,
              col("n_regionkey") + 2, col("n_regionkey") + 3).as("xs"),
            struct(array(col("n_nationkey"), col("n_nationkey") + 1,
              col("n_nationkey") + 2).as("ys")).as("meta")).as("doc"))
      base.select(col("n_nationkey"),
          graft.operators.Nested.toJsonLimited(base, "doc", 9, 2).as("js"))
        .orderBy("n_nationkey")
    },
    // path summary (§1.3): inferred schema + per-path non-null statistics
    "q_path_summary" -> { (s, d) =>
      val base = t(s, d, "customer")
        .select(col("c_custkey"),
          struct(col("c_acctbal").as("bal"),
            struct(col("c_mktsegment").as("seg")).as("meta")).as("doc"))
      graft.operators.PathSummary.of(base).orderBy("path")
    },
    // custom TypedImperativeAggregate (§2.13): exact BigDecimal fold,
    // differential against the engine-native decimal-cast sum
    "q_custom_agg" -> { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(graft.functions.AggregateExpressions
          .exactDecimalSum(col("l_extendedprice")).cast("double").as("sum_price"))
        .orderBy("l_returnflag")
    },
    // JSON serialization of a constructed object (jn:serialize analog)
    "q_serialize" -> { (s, d) =>
      t(s, d, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_name").as("name"), col("n_regionkey").as("region")))
            .as("js"))
        .orderBy("n_nationkey")
    },
    // JSONiq update expressions (§2.14: insert/replace/rename/delete json,
    // array append, element-wise rewrite through []) as struct-column edits
    "q_json_update" -> { (s, d) =>
      import graft.operators.JsonUpdates._
      val doc0 = t(s, d, "orders")
        .select(col("o_orderkey"),
          struct(
            struct(col("o_custkey").as("ckey"),
              col("o_orderstatus").as("status")).as("cust"),
            array(
              struct(col("o_orderkey").as("line_no"),
                col("o_totalprice").as("amt"))).as("lines"))
            .as("doc"))
      doc0
        .withColumn("doc", insertField(col("doc"), "cust.segment",
          concat(lit("seg-"), col("doc.cust.status"))))    // insert json
        .withColumn("doc", renameField(col("doc"), "cust.status", "state"))
        .withColumn("doc", mapField(col("doc"), "lines[].amt")(
          p => p.getField("amt") * 2))                     // replace value of
        .withColumn("doc", appendToArray(col("doc"), "lines",
          struct(lit(-1L).as("line_no"), lit(0.0).as("amt"))))
        .withColumn("doc", removeField(col("doc"), "cust.ckey")) // delete json
        .select(col("o_orderkey"),
          to_json(col("doc.cust")).as("cust_js"),
          col("doc.cust.state").as("state"),
          element_at(col("doc.lines"), 1).getField("amt").as("amt0"),
          size(col("doc.lines")).as("n_lines"))
        .orderBy("o_orderkey")
    }
  )

  val oracles: Map[String, String] = Map(
    // exact cardinality is portable; the HLL estimate is checked by the
    // Spark side's own bounded-error assertion, which the oracle pins true
    "q_approx_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS within_bounds
        |FROM lineitem""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS u, lower(p_brand) AS l,
        |  substr(p_name, 1, 5) AS sub,
        |  p_brand || '-' || p_type AS cat,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  lpad(p_brand, 12, '_') AS pad,
        |  CAST(strpos(p_type, 'a') AS BIGINT) AS pos,
        |  left(p_name, 3) AS l3,
        |  regexp_extract(p_type, '([a-z]+)', 1) AS firstword,
        |  trim(p_name) AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS a,
        |  CAST(floor(p_size / 7.0) AS BIGINT) AS fl,
        |  CAST(ceil(p_size / 7.0) AS BIGINT) AS ce,
        |  sqrt(CAST(p_size AS DOUBLE)) AS sq,
        |  p_size % 5 AS md,
        |  p_size * p_size AS p2,
        |  greatest(p_size, 10) AS gr,
        |  least(p_size, 40) AS le
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS since_epoch,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_variant_json" ->
      """SELECT event_id, TRY_CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_matches(p_type, '^[a-m]') AS m1,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  regexp_extract(p_name, '(\w+)$', 1) AS lastword
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_union_all" ->
      """SELECT k, COUNT(*) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |  UNION ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000)
        |GROUP BY k ORDER BY k""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY flag, status""".stripMargin,
    "q_struct_nav" ->
      """SELECT c_custkey, obj.name AS nm, obj.bal AS bal, obj.meta.seg AS seg
        |FROM (SELECT c_custkey,
        |        struct_pack(name := c_name, bal := c_acctbal,
        |          meta := struct_pack(seg := c_mktsegment)) AS obj
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_nav_parent" ->
      """SELECT s_suppkey, n_name AS parent_name, r_name AS ancestor_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin,
    "q_quantified" ->
      """SELECT o_custkey, bool_and(o_totalprice > 50000) AS every_big,
        |  bool_or(o_orderstatus = 'F') AS some_finished, COUNT(*) AS n
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_deref_descendant" ->
      """SELECT c_custkey, c_acctbal AS bal, c_name AS nm
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_deref_descendant_array" ->
      """SELECT c_custkey, c_acctbal AS first_v,
        |  array_to_string([
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
        |    CAST(CAST(c_acctbal * 2 AS DECIMAL(18,2)) AS VARCHAR),
        |    CAST(CAST(c_acctbal * 3 AS DECIMAL(18,2)) AS VARCHAR),
        |    '0.00'], ',') AS all_v
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_xml_shred" ->
      """SELECT doc_id, node_seq, kind, name, value, path FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS doc_id, 1 AS node_seq,
        |    'element' AS kind, 'nation' AS name, '' AS value, '1' AS path FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 2, 'attribute', 'key',
        |    CAST(n_nationkey AS VARCHAR), '1.1' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 3, 'element', 'name',
        |    '', '1.2' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 4, 'text', '',
        |    n_name, '1.2.1' FROM nation)
        |ORDER BY doc_id, node_seq""".stripMargin,
    "q_xml_axes" ->
      """SELECT doc_id, name, parent_name, n_preceding FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS doc_id, 'name' AS name,
        |    'nation' AS parent_name, 0 AS n_preceding FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS BIGINT), 'region', 'nation', 1 FROM nation)
        |ORDER BY doc_id, name""".stripMargin,
    "q_xml_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS doc_id,
        |  '<!--hdr--><nation xmlns:g="urn:g" key="' || n_nationkey
        |    || '"><?audit level="2"?><g:name>' || n_name
        |    || '</g:name><!--trail:' || n_regionkey || '--></nation>' AS xml
        |FROM nation ORDER BY doc_id""".stripMargin,
    // doc shape <nation><meta>M</meta><name>N</name><region><id>R</id></region></nation>:
    // anchor = <name>; following = region, id, text-R (3); preceding =
    // meta, text-M (2); nation is an ancestor, text-N a descendant — both
    // excluded by the axis definition
    "q_xml_following" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS doc_id,
        |  CAST(3 AS BIGINT) AS n_following, CAST(2 AS BIGINT) AS n_preceding
        |FROM nation ORDER BY doc_id""".stripMargin,
    "q_level_order" ->
      """SELECT doc_id, visit_rank, level, kind, name, value FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS doc_id, 1 AS visit_rank, 1 AS level,
        |    'element' AS kind, 'nation' AS name, '' AS value FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 2, 2, 'attribute', 'key',
        |    CAST(n_nationkey AS VARCHAR) FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 3, 2, 'element', 'name',
        |    '' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 4, 2, 'element', 'region',
        |    '' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 5, 3, 'text', '',
        |    n_name FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 6, 3, 'element', 'id',
        |    '' FROM nation)
        |ORDER BY doc_id, visit_rank""".stripMargin,
    "q_doc_order_sort" ->
      """SELECT doc_id, r AS doc_order_rank, r AS node_seq, kind, name,
        |  TRUE AS ordered_ok FROM (
        |  SELECT CAST(n_nationkey AS BIGINT) AS doc_id, 1 AS r,
        |    'element' AS kind, 'nation' AS name FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 2, 'attribute', 'key' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 3, 'element', 'name' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 4, 'text', '' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 5, 'element', 'region' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 6, 'element', 'id' FROM nation
        |  UNION ALL SELECT CAST(n_nationkey AS BIGINT), 7, 'text', '' FROM nation)
        |ORDER BY doc_id, doc_order_rank""".stripMargin,
    "q_serialize_limited" ->
      """SELECT n_nationkey, '{"name":"' || n_name || '"}' AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_serialize_children" ->
      """SELECT n_nationkey,
        |  '{"name":"' || n_name || '","xs":[' || n_regionkey || ','
        |    || n_regionkey + 1 || '],"meta":{"ys":[' || n_nationkey || ','
        |    || n_nationkey + 1 || ']}}' AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_path_summary" ->
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS path, 'bigint' AS data_type, COUNT(c_custkey) AS n_nonnull FROM customer
        |  UNION ALL
        |  SELECT 'doc.bal' AS path, 'double' AS data_type, COUNT(c_acctbal) AS n_nonnull FROM customer
        |  UNION ALL
        |  SELECT 'doc.meta.seg' AS path, 'string' AS data_type, COUNT(c_mktsegment) AS n_nonnull FROM customer)
        |ORDER BY path""".stripMargin,
    "q_custom_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_serialize" ->
      """SELECT n_nationkey,
        |  '{"name":"' || n_name || '","region":' || n_regionkey || '}' AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_json_update" ->
      """SELECT o_orderkey,
        |  '{"segment":"seg-' || o_orderstatus || '","state":"' || o_orderstatus
        |    || '"}' AS cust_js,
        |  o_orderstatus AS state,
        |  o_totalprice * 2 AS amt0,
        |  CAST(2 AS INTEGER) AS n_lines
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
