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

  /** Serializable scalar comparator for CAS scans — shipped inside the
    * distributed member-scan expression, so it must be a value, not a
    * closure over query state. */
  sealed trait ValueCmp extends (String => Boolean) with Serializable

  /** `jn:scan-cas-index`'s single comparison. The reference casts the
    * search key to the index's content type and compares typed Atomics
    * (index/cas/CASFilter.java:24-47), so a key that parses as a number
    * makes the scan NUMERIC — the [[CmpRange]] discipline: candidate
    * values a decimal index cannot hold (unparseable texts) are never
    * indexed there and never match here. Non-numeric keys compare
    * lexicographically (xs:string indexes). */
  final case class CmpOp(op: String, value: String) extends ValueCmp {
    private val valueN = scala.util.Try(BigDecimal(value)).toOption
    private def cmpTo(c: Int): Boolean = op match {
      case "==" => c == 0
      case "!=" => c != 0
      case "<" => c < 0; case "<=" => c <= 0
      case ">" => c > 0; case ">=" => c >= 0
      case other => throw new UnsupportedOperationException(
        s"cas comparison '$other'")
    }
    override def apply(s: String): Boolean = valueN match {
      case Some(v) =>
        scala.util.Try(BigDecimal(s)).toOption.exists(c => cmpTo(c.compare(v)))
      case None => cmpTo(s.compareTo(value))
    }
  }

  /** `jn:scan-cas-index-range`: numeric bounds compare numerically
    * (values a decimal index cannot hold are not indexed — unparseable
    * texts never match), string bounds lexicographically. */
  final case class CmpRange(low: String, high: String,
                            incLow: Boolean, incHigh: Boolean)
      extends ValueCmp {
    private val lowN = scala.util.Try(BigDecimal(low)).toOption
    private val highN = scala.util.Try(BigDecimal(high)).toOption
    override def apply(s: String): Boolean = (lowN, highN) match {
      case (Some(lo), Some(hi)) =>
        scala.util.Try(BigDecimal(s)).toOption.exists(v =>
          (if (incLow) v >= lo else v > lo) &&
            (if (incHigh) v <= hi else v < hi))
      case _ =>
        (if (incLow) s >= low else s > low) &&
          (if (incHigh) s <= high else s < high)
    }
  }

  /** What a scan looks for — the three textual index-scan families.
    * Serializable: the distributed member scan ships one per entry. */
  sealed trait ScanKind extends Serializable
  /** Path-index scan: nodes whose path CLASS matches (None = every). */
  final case class PathScan(patterns: Option[Seq[String]]) extends ScanKind
  /** CAS scan: SCALAR values at matching classes passing `cmp`. */
  final case class CasScan(patterns: Option[Seq[String]], cmp: ValueCmp)
      extends ScanKind
  /** Name-index scan: object fields whose KEY is in `names`. */
  final case class NameScan(names: Option[Set[String]]) extends ScanKind

  /** One scan hit: the node's canonical JSON, its CONCRETE printed path
    * (member steps as `[i]`, an array node's own path ends `/[]` — the
    * reference's sdb:path rendering, calibrated against
    * testCreateAndScanPathIndex / testCreateAndRetrieveValueFromCASIndex
    * pins), and the parent node's printed path. `ipath` is the hit's
    * IDENTITY path — array-member CAS hits print no self path (the
    * reference's sdb:path semantics) but still denote one concrete
    * node, whose position node-identity functions (`sdb:nodekey`)
    * resolve through; empty = same as `path` ([[Hit.idPath]]). */
  final case class Hit(json: String, path: String, parentPath: String,
                       ipath: String = "") {
    def idPath: String = if (ipath.nonEmpty) ipath else path
  }

  /** Thrown when a skeleton scan cannot answer without the elided
    * member subtrees (the pattern matches a shredded array NODE itself,
    * or a name scan hits the shredded array's own field) — callers fall
    * back to the full-document walk. */
  final class NeedFullWalk(why: String) extends RuntimeException(why)

  // ------------------------------------------------------------ walkers

  import com.fasterxml.jackson.databind.JsonNode

  // ObjectMapper is thread-safe once configured; per-call construction
  // dominated the distributed member scan (one mapper per ROW)
  private lazy val SharedMapper = {
    import com.fasterxml.jackson.databind.{ObjectMapper, SerializationFeature}
    val m = new ObjectMapper()
    m.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    m
  }
  private def newMapper() = SharedMapper

  /** Class-model walker (path/CAS scans) over a tree. `slots` marks
    * placeholder nodes standing in for ELIDED shredded arrays (identity
    * comparison — a placeholder is a specific node instance): reaching
    * one records the document-order slot for that chain's member table
    * instead of walking members. Hits carry their document-order
    * ordinal; slots consume one ordinal so member hits interleave
    * correctly ([slotOrd, memberIdx, k] sorts between neighbors). */
  private final class ClassWalker(
      pats: Option[Seq[List[Pat]]], valueFilter: Option[String => Boolean],
      slots: java.util.IdentityHashMap[JsonNode, List[String]],
      tainted: java.util.Set[JsonNode] = java.util.Collections.emptySet()) {
    private val mapper = newMapper()
    private val isCas = valueFilter.isDefined
    val out = Seq.newBuilder[(Hit, Long)]
    val slotOrds = scala.collection.mutable.Map.empty[List[String], Long]
    private var ord = 0L
    private def ser(n: JsonNode): String =
      mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    private def clsMatches(cls: List[String]): Boolean =
      pats.forall(_.exists(p => matches(cls.reverse, p)))
    private def emitIf(cls: List[String], n: JsonNode, pos: String,
                       parent: String, ipos: String = ""): Unit =
      if (clsMatches(cls)) valueFilter match {
        case Some(f) =>
          // JSON nulls are not typed atomic values — the reference's
          // CAS index never holds them (Cast.cast of a null fails
          // before indexing), so CAS scans skip them
          if (n.isValueNode && !n.isNull && f(n.asText())) {
            out += ((Hit(ser(n), pos, parent, ipos), ord)); ord += 1
          }
        case None =>
          // a hit whose subtree contains an elided member list cannot
          // serialize faithfully from the skeleton
          if (tainted.contains(n))
            throw new NeedFullWalk(s"hit at $pos contains elided members")
          out += ((Hit(ser(n), pos, parent, ipos), ord)); ord += 1
      }
    def walkFields(o: JsonNode, cls: List[String], pos: String): Unit = {
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        walkValue(e.getValue, e.getKey :: cls,
          s"$pos/${NodeKeys.escSeg(e.getKey)}", pos)
      }
    }
    /** `n` occupies a field-value / member / root position of class
      * `cls`, printed position `pos`, under a parent printed `parent`. */
    def walkValue(n: JsonNode, cls: List[String], pos: String,
                  parent: String): Unit = {
      val slotChain = slots.get(n)
      if (slotChain != null) {
        // an elided shredded array: a PATH scan matching the array
        // node itself needs the members' content — unserveable here
        if (!isCas && clsMatches("[]" :: cls))
          throw new NeedFullWalk(
            s"pattern matches the shredded array node at /$pos")
        slotOrds(slotChain) = ord
        ord += 1
        return
      }
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
          // members print parent-only paths; identity stays concrete
          else if (isCas) emitIf(acls, m, "", apath, mpos)
          i += 1
        }
      } else if (n.isObject) {
        if (!isCas) emitIf(cls, n, pos, parent)
        walkFields(n, cls, pos)
      } else emitIf(cls, n, pos, parent)
    }
    /** ONE member of the array at (reversed) class `cls`, member
      * position `mpos`, array path `apath` — exactly the per-member arm
      * of the array case above. */
    def walkMember(m: JsonNode, cls: List[String], mpos: String,
                   apath: String): Unit = {
      if (m.isArray) walkValue(m, cls, mpos, apath)
      else if (m.isObject) walkFields(m, cls, mpos)
      else if (isCas) emitIf(cls, m, "", apath, mpos)
    }
  }

  /** Name-index walker; same slot discipline. */
  private final class NameWalker(
      names: Option[Set[String]],
      slots: java.util.IdentityHashMap[JsonNode, List[String]],
      tainted: java.util.Set[JsonNode] = java.util.Collections.emptySet()) {
    private val mapper = newMapper()
    val out = Seq.newBuilder[(Hit, Long)]
    val slotOrds = scala.collection.mutable.Map.empty[List[String], Long]
    private var ord = 0L
    private def ser(n: JsonNode): String =
      mapper.writeValueAsString(mapper.treeToValue(n, classOf[Object]))
    def walk(n: JsonNode, pos: String): Unit = {
      // a placeholder reached directly (shredded ROOT array)
      val rootSlot = slots.get(n)
      if (rootSlot != null) { slotOrds(rootSlot) = ord; ord += 1; return }
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = s"$pos/${NodeKeys.escSeg(e.getKey)}"
          val slotChain = slots.get(e.getValue)
          if (slotChain != null) {
            // the field's VALUE is elided: a name hit on the field
            // itself would need the members' content
            if (names.forall(_.contains(e.getKey)))
              throw new NeedFullWalk(
                s"name scan hits the shredded array field at $p")
            slotOrds(slotChain) = ord
            ord += 1
          } else {
            if (names.forall(_.contains(e.getKey))) {
              if (tainted.contains(e.getValue))
                throw new NeedFullWalk(
                  s"name hit at $p contains elided members")
              out += ((Hit(ser(e.getValue), p, pos), ord)); ord += 1
            }
            walk(e.getValue, p)
          }
        }
      } else if (n.isArray) {
        val it = n.elements()
        var i = 0
        while (it.hasNext) { walk(it.next(), s"$pos/[$i]"); i += 1 }
      }
    }
  }

  private val NoSlots =
    new java.util.IdentityHashMap[JsonNode, List[String]]()

  /** Full-document scan (the driver-walk form). */
  def scanDoc(json: String, kind: ScanKind): Seq[Hit] = kind match {
    case PathScan(pats) =>
      val w = new ClassWalker(pats.map(_.map(parsePattern)), None, NoSlots)
      w.walkValue(newMapper().readTree(json), Nil, "", "")
      w.out.result().map(_._1)
    case CasScan(pats, cmp) =>
      val w = new ClassWalker(pats.map(_.map(parsePattern)), Some(cmp),
        NoSlots)
      w.walkValue(newMapper().readTree(json), Nil, "", "")
      w.out.result().map(_._1)
    case NameScan(names) =>
      val w = new NameWalker(names, NoSlots)
      w.walk(newMapper().readTree(json), "")
      w.out.result().map(_._1)
  }

  def walkMatches(json: String, pattern: Option[String],
                  valueFilter: Option[String => Boolean] = None): Seq[Hit] =
    walkMatchesAny(json, pattern.map(Seq(_)), valueFilter)

  /** [[walkMatches]] over a SET of path patterns (a node matches when any
    * pattern does) — the `;`-separated `$paths` form the reference's
    * index scans take (jn/index/scan/ScanCASIndexRange.java:88). */
  def walkMatchesAny(json: String, patterns: Option[Seq[String]],
                     valueFilter: Option[String => Boolean] = None)
      : Seq[Hit] = {
    val w = new ClassWalker(patterns.map(_.map(parsePattern)), valueFilter,
      NoSlots)
    w.walkValue(newMapper().readTree(json), Nil, "", "")
    w.out.result().map(_._1)
  }

  /** Document-order hits for a NAME-index scan: every object field whose
    * key is in `names` (None = every key — the reference's null filter),
    * regardless of path class. The hit carries the field's VALUE and the
    * field's own concrete printed path (reference
    * function/jn/index/scan/ScanNameIndex.java — the index maps key
    * names to OBJECT_KEY nodes). */
  def walkNames(json: String, names: Option[Set[String]]): Seq[Hit] =
    scanDoc(json, NameScan(names))

  // ------------------------------------------------ distributed pieces

  /** Skeleton of a shredded document. */
  final case class Skeleton(
      root: JsonNode,
      slots: java.util.IdentityHashMap[JsonNode, List[String]],
      /** nodes with a placeholder somewhere BENEATH them: their serialized
        * content would show `{}` where the members belong, so a scan hit
        * on one must fall back to the full walk */
      tainted: java.util.Set[JsonNode])

  /** Skeleton of a shredded document: the full tree MINUS the member
    * lists of the given fields-only chains, each replaced by a
    * placeholder node (identity-keyed in the returned map). One Jackson
    * streaming pass; elided subtrees are `skipChildren()`-scanned, never
    * built — driver memory is O(skeleton), not O(document). */
  def skeletonTree(json: String, chains: Seq[List[String]]): Skeleton = {
    import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val mapper = newMapper()
    val chainSet = chains.toSet
    val slots = new java.util.IdentityHashMap[JsonNode, List[String]]()
    val tainted = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[JsonNode, java.lang.Boolean]())
    val p = new JsonFactory().createParser(json)
    // fieldChain: fields-only path from the root, REVERSED (innermost
    // first); null once inside any array (chains are fields-only).
    // Returns (node, containsPlaceholder).
    def buildValue(tok: JsonToken,
                   fieldChain: List[String]): (JsonNode, Boolean) =
      tok match {
        case JsonToken.START_OBJECT =>
          val o = mapper.createObjectNode()
          var taint = false
          while (p.nextToken() == JsonToken.FIELD_NAME) {
            val f = p.currentName()
            val vTok = p.nextToken()
            val sub = if (fieldChain == null) null else f :: fieldChain
            if (vTok == JsonToken.START_ARRAY && sub != null &&
                chainSet.contains(sub.reverse)) {
              p.skipChildren()
              val ph = mapper.createObjectNode()
              slots.put(ph, sub.reverse)
              o.set[ObjectNode](f, ph)
              taint = true
            } else {
              val (sn, st) = buildValue(vTok, sub)
              o.set[ObjectNode](f, sn)
              taint ||= st
            }
          }
          if (taint) { tainted.add(o); () }
          (o, taint)
        case JsonToken.START_ARRAY =>
          val a = mapper.createArrayNode()
          var taint = false
          var t = p.nextToken()
          while (t != JsonToken.END_ARRAY && t != null) {
            val (sn, st) = buildValue(t, null)
            a.add(sn)
            taint ||= st
            t = p.nextToken()
          }
          if (taint) { tainted.add(a); () }
          (a, taint)
        case JsonToken.VALUE_STRING =>
          (mapper.getNodeFactory.textNode(p.getText), false)
        case JsonToken.VALUE_NUMBER_INT =>
          (mapper.getNodeFactory.numberNode(p.getBigIntegerValue), false)
        case JsonToken.VALUE_NUMBER_FLOAT =>
          // DOUBLE, not decimal: readTree's default — the full-walk and
          // skeleton scans must render the same asText ("0.9", never
          // the source's "0.90")
          (mapper.getNodeFactory.numberNode(p.getDoubleValue), false)
        case JsonToken.VALUE_TRUE =>
          (mapper.getNodeFactory.booleanNode(true), false)
        case JsonToken.VALUE_FALSE =>
          (mapper.getNodeFactory.booleanNode(false), false)
        case _ => (mapper.getNodeFactory.nullNode(), false)
      }
    val first = p.nextToken()
    // the ROOT ARRAY itself (chain = Nil): a shredded root array's
    // skeleton is just its placeholder
    val root =
      if (first == JsonToken.START_ARRAY && chainSet.contains(Nil)) {
        p.skipChildren()
        val ph = mapper.createObjectNode()
        slots.put(ph, Nil)
        ph
      } else buildValue(first, Nil)._1
    p.close()
    Skeleton(root, slots, tainted)
  }

  /** The slot-marker key of a PERSISTED skeleton sidecar: in the
    * sidecar text each elided chain array appears as
    * `{"<marker>": k}` (k = the chain's ordinal in the entry list).
    * The writer refuses to persist a sidecar whose document contains
    * the literal key itself, so a loaded marker is unambiguous. */
  val SkeletonSlotMarker = "~graft-slot"

  /** Load a skeleton from its persisted sidecar TEXT: parse (same
    * numeric discipline as [[skeletonTree]] — the scans' rendering must
    * match the full walk), then swap each slot-marker object for an
    * empty placeholder registered in `slots`, tainting its ancestors.
    * Lets over-cap documents serve skeleton+member scans without ever
    * reading the document text (reference analog: the name index
    * answers at any size, index/name/NameFilter.java:12). */
  def skeletonFromSidecar(text: String,
                          chains: Seq[List[String]]): Skeleton = {
    val sk0 = skeletonTree(text, Nil)
    val mapper = newMapper()
    val slots = new java.util.IdentityHashMap[JsonNode, List[String]]()
    val tainted = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[JsonNode, java.lang.Boolean]())
    def isMarker(v: JsonNode): Boolean =
      v.isObject && v.size() == 1 && v.has(SkeletonSlotMarker) &&
        // skeletonTree builds integers as BigIntegerNode — test the
        // VALUE class family, not the node class
        v.get(SkeletonSlotMarker).isIntegralNumber
    def slotOf(v: JsonNode): List[String] =
      chains(v.get(SkeletonSlotMarker).asInt())
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    def walk(n: JsonNode): Boolean = {
      var taint = false
      n match {
        case o: ObjectNode =>
          import scala.jdk.CollectionConverters._
          o.fieldNames().asScala.toList.foreach { f =>
            val v = o.get(f)
            if (isMarker(v)) {
              val ph = mapper.createObjectNode()
              slots.put(ph, slotOf(v))
              o.set[ObjectNode](f, ph)
              taint = true
            } else {
              // force evaluation: `taint ||= walk(v)` would short-circuit
              // once taint is true and skip later sibling subtrees
              val st = walk(v); taint = taint || st
            }
          }
        case a: ArrayNode =>
          var i = 0
          while (i < a.size()) {
            val v = a.get(i)
            if (isMarker(v)) {
              val ph = mapper.createObjectNode()
              slots.put(ph, slotOf(v))
              a.set(i, ph)
              taint = true
            } else {
              val st = walk(v); taint = taint || st
            }
            i += 1
          }
        case _ => ()
      }
      if (taint) { tainted.add(n); () }
      taint
    }
    if (isMarker(sk0.root)) {
      val ph = mapper.createObjectNode()
      slots.put(ph, slotOf(sk0.root))
      Skeleton(ph, slots, tainted)
    } else {
      walk(sk0.root)
      Skeleton(sk0.root, slots, tainted)
    }
  }

  /** Scan a skeleton: hits with their document-order ordinals, plus the
    * ordinal reserved for each elided chain's member block. Throws
    * [[NeedFullWalk]] when the answer requires elided content. */
  def scanSkeleton(sk: Skeleton, kind: ScanKind)
      : (Seq[(Hit, Long)], Map[List[String], Long]) = kind match {
    case PathScan(pats) =>
      val w = new ClassWalker(pats.map(_.map(parsePattern)), None,
        sk.slots, sk.tainted)
      w.walkValue(sk.root, Nil, "", "")
      (w.out.result(), w.slotOrds.toMap)
    case CasScan(pats, cmp) =>
      val w = new ClassWalker(pats.map(_.map(parsePattern)), Some(cmp),
        sk.slots, sk.tainted)
      w.walkValue(sk.root, Nil, "", "")
      (w.out.result(), w.slotOrds.toMap)
    case NameScan(names) =>
      val w = new NameWalker(names, sk.slots, sk.tainted)
      w.walk(sk.root, "")
      (w.out.result(), w.slotOrds.toMap)
  }

  /** Per-member scanner for a shredded array (distributed, one `scan`
    * call per member row): `chain` is the array's fields-only path from
    * the root, `idx` the member ordinal. Matches exactly what the full
    * walk computes for this member's subtree. Construct ONCE per task
    * (pattern parsing and position prefixes are per-scan, not per-row). */
  final class MemberScanner(kind: ScanKind, chain: List[String]) {
    private val arrayPos = chain.map("/" + NodeKeys.escSeg(_)).mkString
    private val apath = s"$arrayPos/[]"
    private val seedCls = "[]" :: chain.reverse
    private val parsed: Option[Seq[List[Pat]]] = kind match {
      case PathScan(p) => p.map(_.map(parsePattern))
      case CasScan(p, _) => p.map(_.map(parsePattern))
      case NameScan(_) => None
    }
    def scan(memberJson: String, idx: Long): Seq[Hit] = {
      val mpos = s"$arrayPos/[$idx]"
      kind match {
        case PathScan(_) =>
          val w = new ClassWalker(parsed, None, NoSlots)
          w.walkMember(SharedMapper.readTree(memberJson), seedCls, mpos,
            apath)
          w.out.result().map(_._1)
        case CasScan(_, cmp) =>
          val w = new ClassWalker(parsed, Some(cmp), NoSlots)
          w.walkMember(SharedMapper.readTree(memberJson), seedCls, mpos,
            apath)
          w.out.result().map(_._1)
        case NameScan(names) =>
          val w = new NameWalker(names, NoSlots)
          w.walk(SharedMapper.readTree(memberJson), mpos)
          w.out.result().map(_._1)
      }
    }
  }

  /** One-off member scan (tests / small callers). */
  def scanMember(memberJson: String, kind: ScanKind,
                 chain: List[String], idx: Long): Seq[Hit] =
    new MemberScanner(kind, chain).scan(memberJson, idx)

  /** How a CAS scan's patterns bear on ONE member-table chain. */
  sealed trait EntryPlan
  /** Some pattern may match inside members in a shape the typed
    * columns can't express — run the generic member walk. */
  case object GenericWalk extends EntryPlan
  /** No pattern can match inside this chain's members at all. */
  case object NoMemberHits extends EntryPlan
  /** The patterns reduce to exactly ONE concrete member field
    * (`chain + [] + name`) — the scan compiles onto the typed column,
    * the reference's actual CAS-index model (typed keys, never a
    * document re-walk: index/cas/CASFilter semantics). */
  final case class TypedField(name: String) extends EntryPlan

  def casEntryPlan(patterns: Option[Seq[String]],
                   chain: List[String]): EntryPlan = patterns match {
    case None => GenericWalk // every class — must walk
    case Some(ps) =>
      val cl = chain.length
      var fields = Set.empty[String]
      var generic = false
      ps.map(parsePattern).foreach { p =>
        if (p.contains(Desc)) generic = true // gaps reach anywhere
        else if (p.length <= cl ||
            p(cl) != AnyMember ||
            !chain.zip(p).forall {
              case (n, Name(pn)) => pn == n
              case (_, AnyName) => true
              case _ => false
            }) () // provably outside this chain's member subtrees
        else if (p.length == cl + 1)
          // the array's own class: SCALAR members sit exactly there
          // (the walker's bare-member CAS arm) — needs the walk
          generic = true
        else if (p.length == cl + 2) p.last match {
          case Name(f) => fields += f
          case _ => generic = true
        } else generic = true // deeper than one member field
      }
      if (generic) GenericWalk
      else if (fields.isEmpty) NoMemberHits
      else if (fields.size == 1) TypedField(fields.head)
      else GenericWalk // multi-field: document order needs the walk
  }
}
