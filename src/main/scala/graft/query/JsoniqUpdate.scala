package graft.query

/** JSON update statements over stored documents — the reference's XQUF
  * surface (`insert/delete/replace/append/rename json`,
  * JsonIntegrationTest.java:536-718). Every applied update commits a NEW
  * revision through the temporal table (the reference's
  * auto-commit-per-update-query), so updates compose with `jn:doc(c, d,
  * rev)` time travel and `jn:all-times`.
  *
  * Supported target form: a STATIC path — `jn:doc(...)` followed by
  * literal field derefs and literal array indices. The corpus' runtime-
  * selected targets (a `for`-bound node) need node identity, which the
  * value model deliberately does not carry; those queries raise
  * UnsupportedOperationException rather than guessing. Values must be
  * literal JSON (object/array/scalars, `true()`/`false()`/`jn:null()`,
  * and `(a, b, c)` sequences — which brackets to an array, the corpus'
  * pinned `append json (1, 2, 3)` behaviour). */
private[query] object JsoniqUpdate {
  import Jsoniq._

  final case class StaticTarget(collection: String, doc: String,
                                steps: List[Either[String, Int]])

  /** Resolve `jn:doc('c','d').a[0].b` to a static pointer; None when the
    * target is runtime-dependent. */
  def staticTarget(e: Expr): Option[StaticTarget] = e match {
    case Call("jn:doc", Seq(StrLit(c), StrLit(d))) =>
      Some(StaticTarget(c, d, Nil))
    case Deref(base, f) =>
      staticTarget(base).map(t => t.copy(steps = t.steps :+ Left(f)))
    case ArrayIndex(base, NumLit(n)) if !n.contains(".") =>
      staticTarget(base).map(t => t.copy(steps = t.steps :+ Right(n.toInt)))
    case _ => None
  }

  /** JSON text of a literal-only expression (the update-value subset). */
  def literalJson(e: Expr): Option[String] = e match {
    case NumLit(t) => Some(t)
    case StrLit(s) => Some(quote(s))
    case BoolLit(b) => Some(b.toString)
    case NullLit => Some("null")
    case Call("jn:null", Seq()) => Some("null")
    case Unary("-", NumLit(t)) => Some("-" + t)
    case ArrayCtor(items) =>
      seqOf(items).map(_.mkString("[", ",", "]"))
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

  private def quote(s: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(s)
  }

  /** Apply one statement: read the target doc's head revision, edit with
    * Jackson, commit the result as the next revision. */
  def apply(store: JsoniqRun.Store, stmt: UpdateStmt): Unit = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val target = staticTarget(stmt.target).getOrElse(
      throw new UnsupportedOperationException(
        s"update target must be a static jn:doc path, got ${stmt.target}"))
    val valueJson = stmt.value.map(v => literalJson(v).getOrElse(
      throw new UnsupportedOperationException(
        s"update value must be literal JSON, got $v")))
    val position = stmt.position.map {
      case NumLit(n) if !n.contains(".") => n.toInt
      case other => throw new UnsupportedOperationException(
        s"insert position must be a literal integer, got $other")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val docJson = store.doc(target.collection, target.doc, None)
      .collect().head.getString(0)
    val root = mapper.readTree(docJson)

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
      require(target.steps.nonEmpty,
        s"${stmt.kind} json needs a path INTO the document, not the root")
      (navigate(root, target.steps.dropRight(1)), target.steps.last)
    }

    stmt.kind match {
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
        navigate(root, target.steps) match {
          case a: ArrayNode => a.add(mapper.readTree(valueJson.get)); ()
          case other => throw new IllegalArgumentException(
            s"append target must be an array, got ${other.getNodeType}")
        }
      case "insert" =>
        (navigate(root, target.steps), position) match {
          case (a: ArrayNode, Some(i)) =>
            require(i >= 0 && i <= a.size(), s"insert position $i out of bounds")
            a.insert(i, mapper.readTree(valueJson.get)); ()
          case (o: ObjectNode, None) =>
            mapper.readTree(valueJson.get) match {
              case v: ObjectNode =>
                val it = v.fields()
                while (it.hasNext) { val e = it.next(); o.set(e.getKey, e.getValue); () }
              case other => throw new IllegalArgumentException(
                s"insert into an object needs an object value, got ${other.getNodeType}")
            }
          case (n, p) => throw new IllegalArgumentException(
            s"insert target mismatch: ${n.getNodeType} with position $p")
        }
      case "rename" =>
        val newName = stmt.value.get match {
          case StrLit(s) => s
          case other => throw new UnsupportedOperationException(
            s"rename needs a literal name, got $other")
        }
        parent() match {
          case (p: ObjectNode, Left(f)) =>
            require(p.has(f), s"no field '$f' to rename")
            val v = p.remove(f)
            p.set(newName, v); ()
          case (p, s) => throw new IllegalArgumentException(
            s"rename target mismatch: ${p.getNodeType} vs $s")
        }
      case other => throw new IllegalStateException(s"unknown update kind $other")
    }
    store.store(target.collection, target.doc, mapper.writeValueAsString(root))
  }
}
