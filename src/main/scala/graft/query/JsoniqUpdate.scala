package graft.query

/** JSON update statements over stored documents — the reference's XQUF
  * surface (`insert/delete/replace/append/rename json`,
  * JsonIntegrationTest.java:536-840). Every update statement that
  * applies at least one mutation commits a NEW revision through the
  * temporal table (the reference's auto-commit-per-update), so updates
  * compose with `jn:doc(c, d, rev)` time travel and `jn:all-times`.
  *
  * Targets resolve to JSON POINTERS into the stored document — either
  * fully static (`jn:doc(...).a[1]`, possibly through `let`-bound static
  * paths) or per-binding-tuple ([[JsoniqRun]] collects one pointer per
  * surviving FLWOR tuple: a `for`-bound member carries its (array,
  * position) slot, computed indices like `$doc[$pos - 1]` evaluate per
  * tuple). Pointers dedupe (XQUF's pending-update-list discipline — the
  * same node deleted from three tuples is one delete) and apply in
  * descending document order on one read of the head revision, so every
  * pointer lands on the node it resolved to in the pristine tree no
  * matter what the FLWOR's tuple order was. Values must be literal JSON
  * (`true()`/`false()`/`jn:null()` included; a `(a, b, c)` sequence
  * brackets to an array — the corpus' pinned `append json (1, 2, 3)`
  * behaviour). */
private[query] object JsoniqUpdate {
  import Jsoniq._

  final case class StaticTarget(collection: String, doc: String,
                                steps: List[Either[String, Int]])

  /** Resolve a STATIC document path — `jn:doc(...)` plus literal field
    * derefs / literal indices, possibly through a `let`-bound static
    * path; None when any component is runtime-dependent. */
  def staticTargetIn(e: Expr,
                     env: Map[String, JsoniqRun.Binding]): Option[StaticTarget] =
    e match {
      case Call("jn:doc" | "xml:doc", Seq(StrLit(c), StrLit(d))) =>
        Some(StaticTarget(c, d, Nil))
      case VarRef(n) => env.get(n) match {
        case Some(JsoniqRun.SeqVar(_, st)) => st
        case _ => None
      }
      case Deref(base, f) =>
        staticTargetIn(base, env).map(t => t.copy(steps = t.steps :+ Left(f)))
      case ArrayIndex(base, NumLit(n)) if !n.contains(".") =>
        staticTargetIn(base, env).map(t =>
          t.copy(steps = t.steps :+ Right(n.toInt)))
      case _ => None
    }

  /** JSON text of a literal-only expression (the update-value subset). */
  def literalJson(e: Expr): Option[String] = e match {
    case NumLit(t) => Some(t)
    case StrLit(s) => Some(quote(s))
    case BoolLit(b) => Some(b.toString)
    case NullLit => Some("null")
    case Call("jn:null", Seq()) => Some("null")
    case Call("not", Seq(BoolLit(b))) => Some((!b).toString)
    case Unary("-", NumLit(t)) => Some("-" + t)
    case ArrayCtor(items) => seqOf(items).map(_.mkString("[", ",", "]"))
    case SeqCtor(items) => // a sequence value brackets to an array
      seqOf(items).map(_.mkString("[", ",", "]"))
    case ObjectCtor(entries) =>
      val parts = entries.map {
        case Right((k, v)) => literalJson(v).map(j => quote(k) + ":" + j)
        case Left(_) => None
      }
      if (parts.forall(_.isDefined)) Some(parts.flatten.mkString("{", ",", "}"))
      else None
    case _ => None
  }

  private def seqOf(items: Seq[Expr]): Option[Seq[String]] = {
    val parts = items.map(literalJson)
    if (parts.forall(_.isDefined)) Some(parts.flatten) else None
  }

  private def quote(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  /** Apply one statement's deduped pointers to the head revision and
    * commit once (no-op — no commit — when `pointers` is empty: an
    * empty pending list changes nothing, the XQUF discipline).
    *
    * MEMBER-LOCAL FAST PATH: when the head revision is shredded and
    * every pointer targets strictly INSIDE a shredded member, the
    * commit never collects the document — the touched members patch
    * through one-row reads and the revision commits as a sentinel row
    * over the base text plus the edit log ([[JsoniqRun.Store
    * .commitMemberLocal]]; the write-side twin of replayShredKeys'
    * run translation. Reference analog: JsonNodeTrxImpl mutates CoW
    * page trees in place, O(touched subtree) at any document size). */
  def applyAll(store: JsoniqRun.Store, collection: String, doc: String,
               kind: String, pointers: Seq[List[Either[String, Int]]],
               valueJson: Option[String], position: Option[Int]): Unit = {
    if (pointers.isEmpty) return
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val deduped = pointers.distinct.sortWith(cmpPtr(_, _) < 0)
    if (store.commitMemberLocal(collection, doc,
        deduped.map(p => NodeKeys.Edit(kind, p, valueJson, position))))
      return
    val docJson = store.doc(collection, doc, None)
      .collect().head.getString(0)
    val root = mapper.readTree(docJson)
    val edits = deduped.map(p => NodeKeys.Edit(kind, p, valueJson, position))
    edits.foreach(applyEditToNode(mapper, root, _))
    store.store(collection, doc, mapper.writeValueAsString(root),
      edits = Some(edits))
  }

  /** Descending document order over pointers: deeper targets before
    * their ancestors, higher array indices before lower ones under the
    * same parent. Pointers resolve against the PRISTINE tree (XQUF
    * pending-update list) but Jackson mutates in place — this order
    * guarantees no mutation can shift a pointer applied after it
    * (deletes/inserts only disturb indices >= the mutated slot;
    * replace/append/rename shift nothing). */
  private[query] def cmpPtr(x: List[Either[String, Int]],
                            y: List[Either[String, Int]]): Int = (x, y) match {
    case (Nil, Nil) => 0
    case (Nil, _) => 1  // ancestor applies after its extensions
    case (_, Nil) => -1
    case (hx :: tx, hy :: ty) =>
      val c = (hx, hy) match {
        case (Right(i), Right(j)) => -Integer.compare(i, j)
        case (Left(f), Left(g)) => f.compareTo(g)
        case (Left(_), Right(_)) => -1
        case (Right(_), Left(_)) => 1
      }
      if (c != 0) c else cmpPtr(tx, ty)
  }

  /** Apply ONE update edit to a Jackson tree in place — the mutation
    * core shared by the whole-document path and the member-local
    * fast-commit path (where `root` is a single member's subtree and
    * the edit's pointer is member-relative). */
  private[query] def applyEditToNode(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      root: com.fasterxml.jackson.databind.JsonNode,
      e: NodeKeys.Edit): Unit = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val ptr = e.ptr
    val kind = e.kind
    val valueJson = e.valueJson
    val position = e.pos
    def navigate(node: JsonNode, steps: List[Either[String, Int]]): JsonNode =
      steps match {
        case Nil => node
        case Left(f) :: rest =>
          require(node.isObject && node.has(f), s"no field '$f' at update target")
          navigate(node.get(f), rest)
        case Right(i) :: rest =>
          require(node.isArray && i >= 0 && i < node.size(),
            s"array index $i out of bounds at update target")
          navigate(node.get(i), rest)
      }
    def parent(): (JsonNode, Either[String, Int]) = {
      require(ptr.nonEmpty,
        s"$kind json needs a path INTO the document, not the root")
      (navigate(root, ptr.dropRight(1)), ptr.last)
    }
    kind match {
      case "delete" =>
        parent() match {
          case (p: ObjectNode, Left(f)) => p.remove(f); ()
          case (p: ArrayNode, Right(i)) =>
            require(i >= 0 && i < p.size(), s"delete index $i out of bounds")
            p.remove(i); ()
          case (p, s) => throw new IllegalArgumentException(
            s"delete target mismatch: ${p.getNodeType} vs $s")
        }
      case "replace" =>
        val v = mapper.readTree(valueJson.get)
        parent() match {
          case (p: ObjectNode, Left(f)) =>
            require(p.has(f), s"no field '$f' to replace")
            p.set(f, v); ()
          case (p: ArrayNode, Right(i)) =>
            require(i >= 0 && i < p.size(), s"replace index $i out of bounds")
            p.set(i, v); ()
          case (p, s) => throw new IllegalArgumentException(
            s"replace target mismatch: ${p.getNodeType} vs $s")
        }
      case "append" =>
        navigate(root, ptr) match {
          case a: ArrayNode => a.add(mapper.readTree(valueJson.get)); ()
          case other => throw new IllegalArgumentException(
            s"append target must be an array, got ${other.getNodeType}")
        }
      case "insert" =>
        (navigate(root, ptr), position) match {
          case (a: ArrayNode, Some(i)) =>
            require(i >= 0 && i <= a.size(), s"insert position $i out of bounds")
            a.insert(i, mapper.readTree(valueJson.get)); ()
          case (o: ObjectNode, None) =>
            mapper.readTree(valueJson.get) match {
              case v: ObjectNode =>
                val it = v.fields()
                while (it.hasNext) {
                  val e2 = it.next(); o.set(e2.getKey, e2.getValue); ()
                }
              case other => throw new IllegalArgumentException(
                s"insert into an object needs an object value, got ${other.getNodeType}")
            }
          case (n, p) => throw new IllegalArgumentException(
            s"insert target mismatch: ${n.getNodeType} with position $p")
        }
      case "rename" =>
        val newName = valueJson.get
        parent() match {
          case (p: ObjectNode, Left(f)) =>
            require(p.has(f), s"no field '$f' to rename")
            val v = p.remove(f)
            // valueJson carries the quoted literal; unquote it
            p.set(mapper.readValue(newName, classOf[String]), v); ()
          case (p, s) => throw new IllegalArgumentException(
            s"rename target mismatch: ${p.getNodeType} vs $s")
        }
      case other => throw new IllegalStateException(s"unknown update kind $other")
    }
  }
}
