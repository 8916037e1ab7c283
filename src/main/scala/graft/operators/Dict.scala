package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Dictionary-surrogate layout: write-time global dictionary encoding for
  * low-cardinality string columns.
  *
  * The reference's columnar competitor aggregates directly on parquet
  * dictionary codes, never materializing the strings; Spark's DataFrame
  * surface decodes every value to a UTF8String before hashing it — the
  * BENCH_NOTES.md decomposition attributes ~40% of the string-keyed
  * aggregation gap to that decode+hash work, none of which affects the
  * answer. The engine surface can't be changed, but the LAYOUT can restore
  * the trick: at write time each listed column gains a sibling
  * `<col>__dict` int32 code column whose ordered value list rides in the
  * code column's schema metadata — and therefore in the parquet footer,
  * so the table stays self-contained with no side catalog.
  * [[graft.plans.DictAggRule]] then rewrites string-keyed aggregates onto
  * the code column and decodes group keys from the tiny literal array
  * AFTER aggregation: the scan reads one int32 column where it used to
  * decode strings.
  *
  * Scale shape: the dictionary is global and ordered (code = rank of the
  * value), built by one bounded distinct aggregate per column; encoding is
  * a constant-foldable map-literal lookup — no join, no shuffle, no
  * driver-side iteration over data rows. Codes are assigned in value
  * order, so range predicates on codes mirror range predicates on values.
  *
  * Reference analog: SirixDB keeps names/paths dictionary-coded in its
  * page layout (bundles/sirix-core/src/main/java/io/sirix/node/NodeKind
  * .java name-key indirection via index/name/Names.java:30); this is the
  * same idea applied to arbitrary low-cardinality value columns.
  */
object Dict {
  /** Metadata key holding the ordered dictionary (array of strings). */
  val MetaValues = "graft.dict.values"
  /** Metadata key naming the string column a code column encodes. */
  val MetaFor = "graft.dict.for"
  val Suffix = "__dict"

  def codeCol(c: String): String = c + Suffix

  /** The dictionaries a schema carries (string column → ordered values) —
    * how a writer picks up the PRIOR revision's dictionaries to encode
    * the next one stably (footer-only read, no job). */
  def dictionariesOf(schema: org.apache.spark.sql.types.StructType)
      : Map[String, Array[String]] =
    schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.IntegerType &&
          f.metadata.contains(MetaFor) && f.metadata.contains(MetaValues) =>
        f.metadata.getString(MetaFor) -> f.metadata.getStringArray(MetaValues)
    }.toMap

  /** `df` with an int32 `<col>__dict` code column per listed string
    * column. Null encodes to null; every non-null value is present in the
    * dictionary (built from `df` itself in the same lineage — callers
    * encoding a nondeterministic frame must cache it first). Fails fast
    * past `maxDict` distinct values: global dictionaries are for
    * low-cardinality columns; high-cardinality keys should aggregate on
    * their natural form.
    *
    * `base` makes the dictionary APPEND-ONLY across writes: each listed
    * column's dictionary starts with `base(col)` verbatim (codes stable —
    * what rev 1 called 0 stays 0 forever) and values new to this frame
    * append after it in sorted order. Prefix-compatible dictionaries are
    * what licenses [[graft.plans.DictAggRule]] on MULTI-revision scans:
    * with independent per-write dictionaries the rule must bail on
    * history frames. The trade: with a non-empty base, codes are no
    * longer globally value-ordered (only the fresh-encode path is), which
    * the rewrite never relies on — it maps equality/IN predicates only. */
  def encode(df: DataFrame, cols: Seq[String], maxDict: Int = 4096,
             base: Map[String, Array[String]] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "Dict.encode: no columns given")
    require(cols.distinct == cols,
      s"Dict.encode: duplicate columns in ${cols.mkString(",")}")
    cols.foldLeft(df) { (d, c) =>
      // check the accumulator, not the original frame — a prior fold step
      // may already have added this code column
      require(!d.columns.contains(codeCol(c)),
        s"Dict.encode: input already has a ${codeCol(c)} column")
      val baseVals = base.getOrElse(c, Array.empty[String])
      // the limit must leave room for base values re-appearing in the
      // frame — a truncated distinct list could silently hide NEW values
      val cap = maxDict + baseVals.length + 1
      val fresh = d.select(col(c)).na.drop().distinct()
        .orderBy(col(c)).limit(cap)
        .collect().map(_.getString(0))
      require(fresh.length < cap,
        s"Dict.encode: `$c` has more than $maxDict distinct values — " +
          "dictionary encoding is for low-cardinality columns")
      val baseSet = baseVals.toSet
      val values = baseVals ++ fresh.filterNot(baseSet)
      require(values.length <= maxDict,
        s"Dict.encode: `$c` has more than $maxDict distinct values — " +
          "dictionary encoding is for low-cardinality columns")
      val meta = new MetadataBuilder()
        .putString(MetaFor, c)
        .putStringArray(MetaValues, values)
        .build()
      val lookup = element_at(
        map_from_arrays(typedLit(values), typedLit(values.indices.toArray)),
        col(c))
      d.withColumn(codeCol(c), lookup.as(codeCol(c), meta))
    }
  }

  /** Write `df` as parquet with dictionary-surrogate columns for `cols`.
    * The dictionaries ride in the parquet footer schema, so a plain
    * `spark.read.parquet` of `path` is all [[graft.plans.DictAggRule]]
    * needs to fire. */
  def writeEncoded(df: DataFrame, cols: Seq[String], path: String,
                   maxDict: Int = 4096): Unit =
    encode(df, cols, maxDict).write.mode("overwrite").parquet(path)
}
