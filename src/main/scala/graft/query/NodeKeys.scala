package graft.query

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import scala.collection.mutable

/** Sirix-compatible node identity for stored JSON revisions.
  *
  * The reference assigns every structural node a monotonically
  * increasing node key at insertion time; for a freshly stored document
  * that is a preorder walk with the FUSED record model (the shredder
  * always emits one `OBJECT_NAMED_*` record per object field — the
  * field name and its value are a single node; reference
  * service/json/shredder/JsonShredder.java:551-598, node/json/
  * ObjectNamedObjectNode.java). Keys the rule assigns: document node is
  * 0 (never user-visible), the root value is 1, then preorder where
  *   - the root / every array member consumes one key (OBJECT, ARRAY,
  *     or a primitive value node),
  *   - every object field consumes exactly one key (the fused record IS
  *     the value — no separate key for an object/array field value),
  *   - recursion descends into object fields (source order) and array
  *     members (index order).
  * Calibrated against the reference's own pinned expectations:
  * SelectJsonItemTest (root array = 1, first member = 2),
  * JsonIntegrationTest.testArrayIteration (first object = 2),
  * IndexVersioningIntegrationTest (fused nodekey 7 with
  * FUSE_NAMED_PRIMITIVES), GetDescendantCountTest ({"a":{"b":1}} has 2
  * descendants).
  *
  * Keys are STABLE across update-derived revisions: nodes untouched by
  * an update keep their key, inserted subtrees take fresh keys from
  * `maxKey + 1` in preorder (reference JsonNodeTrxImpl insert paths),
  * same-kind primitive replaces keep the node
  * (JsonItemSequence.replaceObjectValue / replaceArrayElement — the
  * in-place set*Value fast path), kind-changing replaces re-mint the
  * node (JsonNodeTrxImpl.replaceObjectRecordValue: remove + re-insert).
  * [[graft.query.JsoniqUpdate.applyAll]] records each committed edit in
  * a per-revision sidecar; [[JsoniqRun.Store]] replays the chain
  * lazily. Two documented divergences: (1) when a single statement
  * applies SEVERAL inserts, the reference numbers fresh nodes in
  * pending-update-list order while this engine numbers them in its
  * application order (descending document order); keys differ only
  * between those sibling inserts, never for pre-existing nodes.
  * (2) `revertTo` commits a fresh revision whose keys number
  * fused-preorder from 1 — identical to the reverted-to revision when
  * that revision was itself a fresh store, but an update-derived
  * revision's gapped keys are not reproduced (the reference restores
  * the old page trees, keys included). */
private[graft] object NodeKeys {

  final val KStr = 0; final val KNum = 1; final val KBool = 2
  final val KNull = 3; final val KObj = 4; final val KArr = 5

  /** One sirix node: the root, an array member, or a fused object
    * field (whose children are the field value's own fields/members). */
  final class KNode(var key: Long, var kind: Int) {
    var fields: mutable.LinkedHashMap[String, KNode] = _
    var members: mutable.ArrayBuffer[KNode] = _
    def isStructural: Boolean = kind == KObj || kind == KArr
    def childCount: Long =
      if (kind == KObj) fields.size.toLong
      else if (kind == KArr) members.size.toLong else 0L
    def deepCopy(): KNode = deepCopyAt(0)
    private def deepCopyAt(depth: Int): KNode = {
      if (depth > NodeKeys.MaxDepth)
        throw new UnsupportedOperationException(
          s"node identity: tree nesting exceeds ${NodeKeys.MaxDepth} " +
            "levels (accumulated update-inserted subtrees)")
      val n = new KNode(key, kind)
      if (kind == KObj) {
        n.fields = mutable.LinkedHashMap.empty
        fields.foreach { case (k, v) => n.fields.put(k, v.deepCopyAt(depth + 1)) }
      } else if (kind == KArr)
        n.members = members.map(_.deepCopyAt(depth + 1))
      n
    }
  }

  final class KTree(val root: KNode, var maxKey: Long) {
    def deepCopy(): KTree = new KTree(root.deepCopy(), maxKey)

    /** The node at a concrete pointer (root = Nil). */
    def lookup(ptr: List[Either[String, Int]]): Option[KNode] = {
      var cur = root
      var rest = ptr
      while (rest.nonEmpty) {
        rest.head match {
          case Left(f) =>
            if (cur.kind != KObj) return None
            cur.fields.get(f) match {
              case Some(n) => cur = n
              case None => return None
            }
          case Right(i) =>
            if (cur.kind != KArr || i < 0 || i >= cur.members.size)
              return None
            cur = cur.members(i)
        }
        rest = rest.tail
      }
      Some(cur)
    }

    /** DFS search for a key's pointer — select-item resolves one key
      * per call, so O(n) beats holding a reverse index alive. */
    def pathOfKey(key: Long): Option[List[Either[String, Int]]] = {
      val acc = mutable.ArrayBuffer.empty[Either[String, Int]]
      def go(n: KNode): Boolean = {
        if (acc.size > MaxDepth)
          throw new UnsupportedOperationException(
            s"node identity: tree nesting exceeds $MaxDepth levels")
        if (n.key == key) return true
        if (n.kind == KObj) {
          for ((f, c) <- n.fields) {
            acc += Left(f)
            if (go(c)) return true
            acc.remove(acc.size - 1)
          }
        } else if (n.kind == KArr) {
          var i = 0
          while (i < n.members.size) {
            acc += Right(i)
            if (go(n.members(i))) return true
            acc.remove(acc.size - 1)
            i += 1
          }
        }
        false
      }
      if (go(root)) Some(acc.toList) else None
    }

    /** Every (printed path, key) pair — the broadcast side of a
      * per-row nodekey lookup. Paths render exactly like
      * [[JsonPath.Hit]] (`/field`, `/[i]`). */
    def pathKeys: Seq[(String, Long)] = {
      val out = mutable.ArrayBuffer.empty[(String, Long)]
      def go(n: KNode, path: String, depth: Int): Unit = {
        if (depth > MaxDepth)
          throw new UnsupportedOperationException(
            s"node identity: tree nesting exceeds $MaxDepth levels")
        out += ((path, n.key))
        if (n.kind == KObj) n.fields.foreach { case (f, c) =>
          go(c, s"$path/${escSeg(f)}", depth + 1)
        } else if (n.kind == KArr) {
          var i = 0
          while (i < n.members.size) {
            go(n.members(i), s"$path/[$i]", depth + 1); i += 1
          }
        }
      }
      go(root, "", 0)
      out.toSeq
    }
  }

  private def kindOfToken(t: JsonToken): Int = t match {
    case JsonToken.START_OBJECT => KObj
    case JsonToken.START_ARRAY => KArr
    case JsonToken.VALUE_STRING => KStr
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => KNum
    case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => KBool
    case JsonToken.VALUE_NULL => KNull
    case other => throw new IllegalArgumentException(s"unexpected $other")
  }

  private val factory = new JsonFactory()

  /** Nesting cap for the driver-side tree walks: a pathologically deep
    * document well under the byte cap (~1 MB of nested brackets is
    * ~500k levels) must fail with a loud descriptive error, not a
    * driver StackOverflowError. [[build]] is double-fenced — Jackson
    * 2.15+ StreamReadConstraints already rejects nesting past 1000 at
    * parse time — but repeated update-inserted subtrees can STACK
    * depth across [[applyEdit]] replays (each graft adds up to the
    * parser limit), so the copy/search walks
    * ([[KNode.deepCopy]]/[[KTree.pathOfKey]]/[[KTree.pathKeys]]) carry
    * their own guard. 4k levels keeps every recursive walk comfortably
    * inside a default 1 MB JVM stack. */
  final val MaxDepth = 4000

  /** Fused preorder assignment over a revision's full content. */
  def build(json: String): KTree = {
    val p = factory.createParser(json)
    try {
      val t = p.nextToken()
      var next = 1L
      def fresh(kind: Int): KNode = {
        val n = new KNode(next, kind); next += 1
        if (kind == KObj) n.fields = mutable.LinkedHashMap.empty
        else if (kind == KArr) n.members = mutable.ArrayBuffer.empty
        n
      }
      // parser is ON the container's START token; fills n's children
      def fillChildren(n: KNode, depth: Int): Unit = {
        if (depth > MaxDepth) throw new UnsupportedOperationException(
          s"node identity: document nesting exceeds $MaxDepth levels")
        if (n.kind == KObj) {
          while (p.nextToken() != JsonToken.END_OBJECT) {
            val name = p.currentName()
            val vt = p.nextToken()
            val c = fresh(kindOfToken(vt))
            n.fields.put(name, c)
            if (c.isStructural) fillChildren(c, depth + 1)
          }
        } else {
          var vt = p.nextToken()
          while (vt != JsonToken.END_ARRAY) {
            val c = fresh(kindOfToken(vt))
            n.members += c
            if (c.isStructural) fillChildren(c, depth + 1)
            vt = p.nextToken()
          }
        }
      }
      val root = fresh(kindOfToken(t))
      if (root.isStructural) fillChildren(root, 1)
      new KTree(root, next - 1)
    } finally p.close()
  }

  /** Child / descendant counts of one item's content — pure functions
    * of the subtree under the fused model (a fused field is one node;
    * reference sdb/trx/GetChildCount.java, GetDescendantCount.java;
    * GetDescendantCountTest pins {"a":{"b":1}} = 2, excluding self).
    * XML items (the `~n`/`~a`/`~c` [[XmlItem]] encoding) count their
    * STRUCTURAL children/descendants (elements + text nodes — the
    * reference's axis model; attributes are not children). The XML
    * sniff is CONTENT-based and can false-positive on a JSON object
    * whose own fields are named `~n`/`~a`/`~c` — callers that KNOW the
    * data is JSON (member-table key layouts) must pass
    * `jsonOnly = true`; the ambiguous sniff serves only the scalar
    * count functions, where genuine XML items flow. */
  def treeCounts(json: String, jsonOnly: Boolean = false): (Long, Long) = {
    if (!jsonOnly &&
        (json.startsWith("{\"~n\"") || json.startsWith("{\"~a\""))) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json)
      if (root.isObject && root.has("~n")) {
        def desc(n: com.fasterxml.jackson.databind.JsonNode): Long =
          if (n.isObject && n.has("~c")) {
            var d = 0L
            val it = n.get("~c").elements()
            while (it.hasNext) d += 1 + desc(it.next())
            d
          } else 0L
        return (Option(root.get("~c")).map(_.size.toLong).getOrElse(0L),
          desc(root))
      }
    }
    treeCountsJson(json)
  }

  private def treeCountsJson(json: String): (Long, Long) = {
    val p = factory.createParser(json)
    try {
      val t = p.nextToken()
      if (t != JsonToken.START_OBJECT && t != JsonToken.START_ARRAY)
        return (0L, 0L)
      val isObj = t == JsonToken.START_OBJECT
      var child = 0L
      var desc = 0L
      var depth = 1
      var tok = p.nextToken()
      while (depth > 0) {
        tok match {
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
          case JsonToken.FIELD_NAME =>
            desc += 1 // the fused record
            if (depth == 1) child += 1
            p.nextToken() match {
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
                depth += 1
              case _ => () // primitive payload rides the fused record
            }
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
            // array-member container: its own node
            desc += 1
            if (depth == 1 && !isObj) child += 1
            depth += 1
          case _ =>
            // array-member primitive: one value node
            desc += 1
            if (depth == 1 && !isObj) child += 1
        }
        if (depth > 0) tok = p.nextToken()
      }
      (child, desc)
    } finally p.close()
  }

  /** Preorder offset of `ptr` inside ONE member's subtree under the
    * fused model (0 = the member itself) — the executor-side arm of
    * distributed node-key resolution: a shredded member's absolute key
    * is `memberBase + prefixOffset(idx) + relativeOffset(ptr)`. */
  def relativeOffset(memberJson: String,
                     ptr: List[Either[String, Int]]): Option[Long] =
    build(memberJson).lookup(ptr).map(_.key - 1)

  /** Fused-preorder key assignment over a SKELETON (a shredded
    * revision's tree with member lists elided — [[JsonPath.Skeleton]]):
    * every skeleton node gets its key exactly as the full walk would
    * assign it, each elided array's members consume `entryTotals(chain)`
    * keys in place. Returns the skeleton's (printed path, key) pairs
    * (the [[KTree.pathKeys]] dialect) and each elided chain's
    * `memberBase` (the key of member 0). Driver cost is O(skeleton):
    * the members never materialize. */
  def assignSkeleton(root: com.fasterxml.jackson.databind.JsonNode,
                     slots: java.util.IdentityHashMap[
                       com.fasterxml.jackson.databind.JsonNode, List[String]],
                     entryTotals: Map[List[String], Long])
      : (Seq[(String, Long)], Map[List[String], Long]) = {
    val (t, bases, _) = buildSkeletonTree(root, slots, entryTotals)
    (t.pathKeys, bases)
  }

  /** [[assignSkeleton]]'s assignment as a mutable [[KTree]] — the
    * replay substrate for distributed node identity over UPDATE-DERIVED
    * shredded revisions ([[JsoniqRun]]'s edit-log replay): skeleton
    * nodes carry their keys and KINDS, each elided array is a KArr
    * node with an EMPTY member buffer whose members' key range
    * (`bases(chain) .. bases(chain) + total`) lives in the offsets
    * sidecar instead. Skeleton-level edits then replay with the same
    * [[applyEdit]] the driver-tree path uses. Returns
    * (tree, memberBases, maxKey). */
  def buildSkeletonTree(root: com.fasterxml.jackson.databind.JsonNode,
                        slots: java.util.IdentityHashMap[
                          com.fasterxml.jackson.databind.JsonNode, List[String]],
                        entryTotals: Map[List[String], Long])
      : (KTree, Map[List[String], Long], Long) = {
    val bases = mutable.Map.empty[List[String], Long]
    var next = 1L
    def kindOf(n: com.fasterxml.jackson.databind.JsonNode): Int =
      if (n.isObject) KObj else if (n.isArray) KArr
      else if (n.isTextual) KStr else if (n.isNumber) KNum
      else if (n.isBoolean) KBool else KNull
    def walk(n: com.fasterxml.jackson.databind.JsonNode): KNode = {
      val slotChain = slots.get(n)
      if (slotChain != null) {
        // the elided array node itself: one key, then its members'
        // whole key range (tracked off-tree)
        val kn = new KNode(next, KArr)
        kn.members = mutable.ArrayBuffer.empty
        next += 1
        bases(slotChain) = next
        next += entryTotals.getOrElse(slotChain,
          throw new IllegalStateException(
            s"no member total for elided chain $slotChain"))
        return kn
      }
      val kn = new KNode(next, kindOf(n))
      next += 1
      if (n.isObject) {
        kn.fields = mutable.LinkedHashMap.empty
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          kn.fields.put(e.getKey, walk(e.getValue))
        }
      } else if (n.isArray) {
        kn.members = mutable.ArrayBuffer.empty
        val it = n.elements()
        while (it.hasNext) { kn.members += walk(it.next()); () }
      }
      kn
    }
    val t = new KTree(walk(root), next - 1)
    (t, bases.toMap, next - 1)
  }

  /** Shift every key in a built subtree by `delta` — minting a freshly
    * parsed subtree into the key space above an existing tree's maxKey
    * (the [[applyEdit]] freshSubtree discipline, exposed for the
    * distributed replay's member-level inserts). */
  def rebase(n: KNode, delta: Long): Unit = {
    n.key += delta
    if (n.kind == KObj) n.fields.valuesIterator.foreach(rebase(_, delta))
    else if (n.kind == KArr) n.members.foreach(rebase(_, delta))
  }

  /** One recorded update operation, exactly what
    * [[JsoniqUpdate.applyAll]] committed (applied order). */
  final case class Edit(kind: String, ptr: List[Either[String, Int]],
                        valueJson: Option[String], pos: Option[Int])

  /** Fresh-keyed subtree for an inserted value. */
  private def freshSubtree(tree: KTree, valueJson: String): KNode = {
    val sub = build(valueJson)
    val base = tree.maxKey
    def shift(n: KNode): Unit = {
      n.key += base
      if (n.kind == KObj) n.fields.valuesIterator.foreach(shift)
      else if (n.kind == KArr) n.members.foreach(shift)
    }
    shift(sub.root)
    tree.maxKey = base + sub.maxKey
    sub.root
  }

  private def primitiveSameKind(oldKind: Int, newKind: Int): Boolean =
    oldKind == newKind && oldKind != KObj && oldKind != KArr

  /** Mutate `tree` exactly as the recorded edit mutated the document.
    * Key discipline per reference: delete drops the subtree's keys;
    * same-kind primitive replace keeps the node (set*Value); any other
    * replace re-mints the target subtree; append/insert mint fresh
    * preorder keys; rename keeps the node. */
  def applyEdit(tree: KTree, e: Edit): Unit = {
    def parentOf(ptr: List[Either[String, Int]]): KNode =
      tree.lookup(ptr.dropRight(1)).getOrElse(
        throw new IllegalStateException(
          s"nodekey replay: missing ${renderPath(ptr)}"))
    e.kind match {
      case "delete" =>
        (parentOf(e.ptr), e.ptr.last) match {
          case (p, Left(f)) if p.kind == KObj => p.fields.remove(f); ()
          case (p, Right(i)) if p.kind == KArr => p.members.remove(i); ()
          case _ => throw new IllegalStateException("delete replay mismatch")
        }
      case "replace" =>
        val v = e.valueJson.get
        val newKind = kindOfJson(v)
        (parentOf(e.ptr), e.ptr.last) match {
          case (p, Left(f)) if p.kind == KObj =>
            val old = p.fields(f)
            if (primitiveSameKind(old.kind, newKind)) ()
            else { p.fields.put(f, freshSubtree(tree, v)); () }
          case (p, Right(i)) if p.kind == KArr =>
            val old = p.members(i)
            if (primitiveSameKind(old.kind, newKind)) ()
            else p.members(i) = freshSubtree(tree, v)
          case _ => throw new IllegalStateException("replace replay mismatch")
        }
      case "append" =>
        tree.lookup(e.ptr) match {
          case Some(a) if a.kind == KArr =>
            a.members += freshSubtree(tree, e.valueJson.get); ()
          case _ => throw new IllegalStateException("append replay mismatch")
        }
      case "insert" =>
        (tree.lookup(e.ptr), e.pos) match {
          case (Some(a), Some(i)) if a.kind == KArr =>
            a.members.insert(i, freshSubtree(tree, e.valueJson.get))
          case (Some(o), None) if o.kind == KObj =>
            // object insert merges fields; an overwritten field is a
            // remove + fresh insert (position preserved, like the
            // Jackson set the document write performed)
            val sub = freshSubtree(tree, e.valueJson.get)
            require(sub.kind == KObj, "object insert needs an object")
            sub.fields.foreach { case (k, n) => o.fields.put(k, n) }
          case _ => throw new IllegalStateException("insert replay mismatch")
        }
      case "rename" =>
        (parentOf(e.ptr), e.ptr.last) match {
          case (p, Left(f)) if p.kind == KObj =>
            val newName = com.fasterxml.jackson.databind.json.JsonMapper
              .builder().build().readValue(e.valueJson.get,
                classOf[String])
            val old = p.fields.remove(f).getOrElse(
              throw new IllegalStateException(s"rename replay: no $f"))
            p.fields.put(newName, old); ()
          case _ => throw new IllegalStateException("rename replay mismatch")
        }
      case other =>
        throw new IllegalStateException(s"unknown edit kind $other")
    }
  }

  private[query] def kindOfJson(v: String): Int = {
    val p = factory.createParser(v)
    try kindOfToken(p.nextToken()) finally p.close()
  }

  // ---- printed-path bridge (the Hit.path / sdb:path rendering) ----

  /** Escape ONE field name for the printed-path dialect: `~`→`~0`,
    * `/`→`~1`, `[`→`~2`, `]`→`~3`. A field literally named `a/b` or
    * `[3]` must round-trip to the same pointer — the reference's path
    * classes store name keys, never rendered strings, so collisions
    * there are impossible by construction; here the rendered dialect
    * is collision-free instead. The common case (no special chars)
    * returns the name itself, zero allocation. */
  def escSeg(f: String): String = {
    var i = 0
    var clean = true
    while (clean && i < f.length) {
      val c = f.charAt(i)
      if (c == '~' || c == '/' || c == '[' || c == ']') clean = false
      i += 1
    }
    if (clean) f
    else {
      val sb = new java.lang.StringBuilder(f.length + 4)
      f.foreach {
        case '~' => sb.append("~0"); ()
        case '/' => sb.append("~1"); ()
        case '[' => sb.append("~2"); ()
        case ']' => sb.append("~3"); ()
        case c => sb.append(c); ()
      }
      sb.toString
    }
  }

  def unescSeg(s: String): String =
    if (s.indexOf('~') < 0) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '~' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '0' => sb.append('~'); ()
            case '1' => sb.append('/'); ()
            case '2' => sb.append('['); ()
            case '3' => sb.append(']'); ()
            case other => sb.append('~').append(other); ()
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  def renderPath(ptr: List[Either[String, Int]]): String =
    ptr.map {
      case Left(f) => s"/${escSeg(f)}"
      case Right(i) => s"/[$i]"
    }.mkString

  /** Parse a printed path back to a pointer; an array node's own
    * trailing `/[]` marker is identity-neutral and drops. Bracketed
    * segments are always INDICES — a literal bracket in a field name
    * rendered as `~2`/`~3`. */
  def parsePath(s: String): List[Either[String, Int]] =
    s.split('/').toList.filter(_.nonEmpty).filter(_ != "[]").map { seg =>
      if (seg.startsWith("[") && seg.endsWith("]"))
        Right(seg.substring(1, seg.length - 1).toInt)
      else Left(unescSeg(seg))
    }

  // ---- edits sidecar (de)serialization ----

  /** Serialize a log. `writer` is the committing writer's reservation
    * token (TemporalTable's commit-log `writerId`): a reader verifies
    * the log belongs to the revision it sits next to before replaying
    * — a stale log from a crashed writer that never committed its
    * revision must never replay against someone else's content. */
  def editsToJson(edits: Seq[Edit], writer: Option[String] = None)
      : String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val env = mapper.createObjectNode()
    writer.foreach(env.put("writer", _))
    val arr = env.putArray("edits")
    edits.foreach { e =>
      val o = arr.addObject()
      o.put("kind", e.kind)
      val p = o.putArray("ptr")
      e.ptr.foreach {
        case Left(f) => p.addObject().put("f", f); ()
        case Right(i) => p.addObject().put("i", i); ()
      }
      e.valueJson.foreach(v => o.set[com.fasterxml.jackson.databind
        .JsonNode]("value", mapper.readTree(v)))
      e.pos.foreach(o.put("pos", _))
    }
    mapper.writeValueAsString(env)
  }

  def editsFromJson(json: String): Seq[Edit] =
    editsEnvelopeFromJson(json)._2

  /** (writer token, edits). Accepts the pre-token bare-array layout
    * (writer = None). */
  def editsEnvelopeFromJson(json: String): (Option[String], Seq[Edit]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val (writer, arr) =
      if (root.isObject)
        (Option(root.get("writer")).map(_.asText()), root.get("edits"))
      else (None, root)
    import scala.jdk.CollectionConverters._
    (writer, arr.elements().asScala.map { o =>
      val ptr = o.get("ptr").elements().asScala.map { s =>
        if (s.has("f")) Left(s.get("f").asText())
        else Right(s.get("i").asInt())
      }.toList
      Edit(o.get("kind").asText(), ptr,
        Option(o.get("value")).map(_.toString),
        Option(o.get("pos")).map(_.asInt()))
    }.toSeq)
  }
}
