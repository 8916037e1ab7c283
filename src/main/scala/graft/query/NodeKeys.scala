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
    def deepCopy(): KNode = {
      val n = new KNode(key, kind)
      if (kind == KObj) {
        n.fields = mutable.LinkedHashMap.empty
        fields.foreach { case (k, v) => n.fields.put(k, v.deepCopy()) }
      } else if (kind == KArr)
        n.members = members.map(_.deepCopy())
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
      def go(n: KNode, path: String): Unit = {
        out += ((path, n.key))
        if (n.kind == KObj) n.fields.foreach { case (f, c) =>
          go(c, s"$path/$f")
        } else if (n.kind == KArr) {
          var i = 0
          while (i < n.members.size) {
            go(n.members(i), s"$path/[$i]"); i += 1
          }
        }
      }
      go(root, "")
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
      def fillChildren(n: KNode): Unit =
        if (n.kind == KObj) {
          while (p.nextToken() != JsonToken.END_OBJECT) {
            val name = p.currentName()
            val vt = p.nextToken()
            val c = fresh(kindOfToken(vt))
            n.fields.put(name, c)
            if (c.isStructural) fillChildren(c)
          }
        } else {
          var vt = p.nextToken()
          while (vt != JsonToken.END_ARRAY) {
            val c = fresh(kindOfToken(vt))
            n.members += c
            if (c.isStructural) fillChildren(c)
            vt = p.nextToken()
          }
        }
      val root = fresh(kindOfToken(t))
      if (root.isStructural) fillChildren(root)
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
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    val bases = mutable.Map.empty[List[String], Long]
    var next = 1L
    def walk(n: com.fasterxml.jackson.databind.JsonNode,
             path: String): Unit = {
      val slotChain = slots.get(n)
      if (slotChain != null) {
        // the elided array node itself: one key, then its members'
        // whole key range
        out += ((path, next)); next += 1
        bases(slotChain) = next
        next += entryTotals.getOrElse(slotChain,
          throw new IllegalStateException(
            s"no member total for elided chain $slotChain"))
        return
      }
      out += ((path, next)); next += 1
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          walk(e.getValue, s"$path/${e.getKey}")
        }
      } else if (n.isArray) {
        val it = n.elements()
        var i = 0
        while (it.hasNext) { walk(it.next(), s"$path/[$i]"); i += 1 }
      }
    }
    walk(root, "")
    (out.toSeq, bases.toMap)
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

  private def kindOfJson(v: String): Int = {
    val p = factory.createParser(v)
    try kindOfToken(p.nextToken()) finally p.close()
  }

  // ---- printed-path bridge (the Hit.path / sdb:path rendering) ----

  def renderPath(ptr: List[Either[String, Int]]): String =
    ptr.map { case Left(f) => s"/$f"; case Right(i) => s"/[$i]" }.mkString

  /** Parse a printed path back to a pointer; an array node's own
    * trailing `/[]` marker is identity-neutral and drops. */
  def parsePath(s: String): List[Either[String, Int]] =
    s.split('/').toList.filter(_.nonEmpty).filter(_ != "[]").map { seg =>
      if (seg.startsWith("[") && seg.endsWith("]"))
        Right(seg.substring(1, seg.length - 1).toInt)
      else Left(seg)
    }

  // ---- edits sidecar (de)serialization ----

  def editsToJson(edits: Seq[Edit]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
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
    mapper.writeValueAsString(arr)
  }

  def editsFromJson(json: String): Seq[Edit] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    arr.elements().asScala.map { o =>
      val ptr = o.get("ptr").elements().asScala.map { s =>
        if (s.has("f")) Left(s.get("f").asText())
        else Right(s.get("i").asInt())
      }.toList
      Edit(o.get("kind").asText(), ptr,
        Option(o.get("value")).map(_.toString),
        Option(o.get("pos")).map(_.asInt()))
    }.toSeq
  }
}
