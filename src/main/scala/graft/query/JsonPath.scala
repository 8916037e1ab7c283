package graft.query

/** Sirix path-summary paths over JSON values — the notation the
  * reference's index DDL uses (`/sirix/[]/revision/tada/[]`,
  * `'//[]'`, a `*` after a `//` gap; reference path summary:
  * bundles/sirix-core/src/main/java/io/sirix/index/path/summary/
  * PathSummaryReader.java). A concrete node's path is the list of
  * steps from the root: object-field names and `[]` for array members.
  * Patterns add `*` (any field), `[]` (array member), and `//`
  * (descendant gap); `\/` escapes a slash inside a field name. */
private[query] object JsonPath {

  sealed trait Pat
  case object Desc extends Pat // '//' gap: zero or more steps
  case object AnyName extends Pat // '*'
  case object AnyMember extends Pat // '[]'
  final case class Name(n: String) extends Pat

  /** Parse a pattern: split on unescaped '/', empty segments between
    * two slashes mark descendant gaps. */
  def parsePattern(pattern: String): List[Pat] = {
    val segs = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern(i) match {
        case '\\' if i + 1 < pattern.length && pattern(i + 1) == '/' =>
          sb.append('/'); i += 2
        case '/' => segs += sb.toString; sb.clear(); i += 1
        case c => sb.append(c); i += 1
      }
    }
    segs += sb.toString
    // leading '' from the root slash is structural, drop ONE of them;
    // later empty segments are '//' gaps
    val body = if (segs.headOption.contains("")) segs.tail else segs
    body.toList.map {
      case "" => Desc
      case "[]" => AnyMember
      case "*" => AnyName
      case n => Name(n)
    }
  }

  /** Does a concrete path (field names / "[]") match the pattern? */
  def matches(path: List[String], pattern: List[Pat]): Boolean =
    (path, pattern) match {
      case (Nil, Nil) => true
      case (_, Desc :: restP) =>
        // zero or more steps
        matches(path, restP) ||
          (path.nonEmpty && matches(path.tail, pattern))
      case (p :: restN, pat :: restP) =>
        val stepOk = pat match {
          case AnyMember => p == "[]"
          case AnyName => p != "[]"
          case Name(n) => p == n
          case Desc => false
        }
        stepOk && matches(restN, restP)
      case _ => false
    }

  /** Document-order nodes whose PATH CLASS matches `pattern`; each match
    * serialized compact with sorted keys (the canonical variant form).
    *
    * Class model (calibrated against the reference's own pinned scans —
    * testCreateAndScanPathIndex's concrete paths and testNesting31):
    * every ARRAY contributes ONE `[]` class level covering the array
    * and its member positions; nested arrays add another level; object
    * fields add name levels; object members add nothing of their own.
    * A PATH scan (no `valueFilter`) emits array nodes at `[]`-ending
    * classes and field VALUES (any kind) at name-ending classes — never
    * bare members. A CAS scan (`valueFilter` set) emits SCALAR values
    * satisfying the comparison, wherever their class matches (array
    * members sit at the array's `[]` level). */
  /** One scan hit: the node's canonical JSON, its CONCRETE printed path
    * (member steps as `[i]`, an array node's own path ends `/[]` — the
    * reference's sdb:path rendering, calibrated against
    * testCreateAndScanPathIndex / testCreateAndRetrieveValueFromCASIndex
    * pins), and the parent node's printed path. */
  final case class Hit(json: String, path: String, parentPath: String)

  def walkMatches(json: String, pattern: Option[String],
                  valueFilter: Option[String => Boolean] = None): Seq[Hit] =
    walkMatchesAny(json, pattern.map(Seq(_)), valueFilter)

  /** [[walkMatches]] over a SET of path patterns (a node matches when any
    * pattern does) — the `;`-separated `$paths` form the reference's
    * index scans take (jn/index/scan/ScanCASIndexRange.java:88). */
  def walkMatchesAny(json: String, patterns: Option[Seq[String]],
                     valueFilter: Option[String => Boolean] = None): Seq[Hit] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
    val mapper = new ObjectMapper()
    mapper.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    // None = every class (a CAS index declared over ('//*','//[]'))
    val pats = patterns.map(_.map(parsePattern))
    val isCas = valueFilter.isDefined
    val out = Seq.newBuilder[Hit]
    def ser(n: JsonNode): String =
      mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    def emitIf(cls: List[String], n: JsonNode, pos: String,
               parent: String): Unit =
      if (pats.forall(_.exists(p => matches(cls.reverse, p)))) valueFilter match {
        case Some(f) =>
          if (n.isValueNode && f(n.asText())) out += Hit(ser(n), pos, parent)
        case None => out += Hit(ser(n), pos, parent)
      }
    def walkFields(o: JsonNode, cls: List[String], pos: String): Unit = {
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        walkValue(e.getValue, e.getKey :: cls, s"$pos/${e.getKey}", pos)
      }
    }
    /** `n` occupies a field-value / member / root position of class
      * `cls`, printed position `pos`, under a parent printed `parent`. */
    def walkValue(n: JsonNode, cls: List[String], pos: String,
                  parent: String): Unit = {
      if (n.isArray) {
        val acls = "[]" :: cls
        val apath = s"$pos/[]" // the array node's own printed path
        if (!isCas) emitIf(acls, n, apath, parent)
        val it = n.elements()
        var i = 0
        while (it.hasNext) {
          val m = it.next()
          val mpos = s"$pos/[$i]"
          if (m.isArray) walkValue(m, acls, mpos, apath)
          else if (m.isObject) walkFields(m, acls, mpos)
          else if (isCas) emitIf(acls, m, "", apath) // members: parent-only path
          i += 1
        }
      } else if (n.isObject) {
        if (!isCas) emitIf(cls, n, pos, parent)
        walkFields(n, cls, pos)
      } else emitIf(cls, n, pos, parent)
    }
    walkValue(mapper.readTree(json), Nil, "", "")
    out.result()
  }

  /** Document-order hits for a NAME-index scan: every object field whose
    * key is in `names` (None = every key — the reference's null filter),
    * regardless of path class. The hit carries the field's VALUE and the
    * field's own concrete printed path (reference
    * function/jn/index/scan/ScanNameIndex.java — the index maps key
    * names to OBJECT_KEY nodes). */
  def walkNames(json: String, names: Option[Set[String]]): Seq[Hit] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
    val mapper = new ObjectMapper()
    mapper.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    val out = Seq.newBuilder[Hit]
    def ser(n: JsonNode): String =
      mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    def walk(n: JsonNode, pos: String): Unit =
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = s"$pos/${e.getKey}"
          if (names.forall(_.contains(e.getKey)))
            out += Hit(ser(e.getValue), p, pos)
          walk(e.getValue, p)
        }
      } else if (n.isArray) {
        val it = n.elements()
        var i = 0
        while (it.hasNext) { walk(it.next(), s"$pos/[$i]"); i += 1 }
      }
    walk(mapper.readTree(json), "")
    out.result()
  }
}
