package graft.query

/** JSONiq-subset front end, part 1: tokenizer + AST + recursive-descent
  * parser. The textual query surface of the reference is JSONiq compiled
  * through Brackit (bundles/sirix-query/src/main/java/io/sirix/query/
  * SirixCompileChain.java:425-446); this front end parses the subset its
  * integration corpus (JsonIntegrationTest.java) exercises and
  * [[JsoniqRun]] compiles it onto the SAME public DataFrame operators a
  * direct caller would use — it is a thin translator, not a second
  * engine.
  *
  * Grammar subset (the corpus' surface):
  *   FLWOR      for/let/where/order by/return (at-position omitted)
  *   postfix    `.field` `."quoted"` `.$var` deref, `=>>field` descendant
  *              deref, `[]` unbox, `[i]` 0-based index, `[i:j]` slice,
  *              `[?pred]` filter with `$$` context item
  *   operators  or/and, eq ne lt le gt ge = != < <= > >=, to,
  *              + - * div idiv mod, unary -
  *   primaries  literals, `{...}` object (incl. `{$x, "k": v}` merge),
  *              `[...]` array, `($e, ...)` sequence, `$var`, `$$`,
  *              if/then/else, function calls (qnames with `:`)
  */
object Jsoniq {

  // ---------------------------------------------------------------- AST
  sealed trait Expr
  final case class NumLit(text: String) extends Expr
  final case class StrLit(value: String) extends Expr
  final case class BoolLit(value: Boolean) extends Expr
  case object NullLit extends Expr
  final case class VarRef(name: String) extends Expr
  case object ContextItem extends Expr // $$
  final case class SeqCtor(items: Seq[Expr]) extends Expr
  final case class ArrayCtor(items: Seq[Expr]) extends Expr
  /** entries: Left(splat source) | Right((key, value)) */
  final case class ObjectCtor(entries: Seq[Either[Expr, (String, Expr)]]) extends Expr
  final case class Deref(base: Expr, field: String) extends Expr
  // -- XPath-lite steps over the XML item encoding ([[XmlItem]]) --
  final case class ChildStep(base: Expr, name: String) extends Expr
  final case class DescStep(base: Expr, name: String) extends Expr
  final case class TextStep(base: Expr) extends Expr
  final case class AttrStep(base: Expr, name: String) extends Expr
  /** `.$var` — field name taken from a bound variable (bit:fields loop) */
  final case class DerefVar(base: Expr, varName: String) extends Expr
  final case class DescendantDeref(base: Expr, field: String) extends Expr
  final case class Unbox(base: Expr) extends Expr
  final case class ArrayIndex(base: Expr, index: Expr) extends Expr
  final case class ArraySlice(base: Expr, from: Expr, until: Expr) extends Expr
  final case class FilterPred(base: Expr, pred: Expr) extends Expr
  final case class Binary(op: String, lhs: Expr, rhs: Expr) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Range(from: Expr, to: Expr) extends Expr
  final case class If(cond: Expr, thenE: Expr, elseE: Expr) extends Expr
  final case class InstanceOf(e: Expr, typeName: String) extends Expr
  final case class Call(name: String, args: Seq[Expr]) extends Expr
  /** `some $v in e, ... satisfies pred` — existential quantifier. */
  final case class Quantified(bindings: Seq[(String, Expr)],
                              pred: Expr) extends Expr
  sealed trait Clause
  final case class ForClause(varName: String, in: Expr,
                             posVar: Option[String] = None) extends Clause
  final case class LetClause(varName: String, value: Expr) extends Clause
  final case class WhereClause(cond: Expr) extends Clause
  final case class OrderClause(keys: Seq[OrderKey]) extends Clause
  final case class OrderKey(key: Expr, descending: Boolean,
                            emptyLeast: Boolean = false)
  /** `group by $k1, $k2` — each key names a variable bound earlier in
    * this FLWOR (the reference corpus' grouping-spec shape:
    * bundles/sirix-query/src/test/java/io/sirix/query/scan/
    * TypedGroupByDifferentialTest.java:188). After the clause the key
    * variables hold the group key and every other variable bound in
    * this FLWOR holds the concatenated sequence over the group. */
  final case class GroupClause(keys: Seq[String]) extends Clause
  /** `count $c` — binds the 1-based position of each tuple in the
    * stream at this point (XQuery 3.0 count clause). */
  final case class CountClause(varName: String) extends Clause
  /** XQuery-3.0-style FLWOR: for/let/where/order by clauses interleave
    * freely before the return, applying at their position. */
  final case class Flwor(clauses: Seq[Clause], ret: Expr) extends Expr
  /** JSON update statement (XQUF-style): kind is one of `delete`,
    * `replace` (value-of), `append`, `insert`, `rename`. */
  final case class UpdateStmt(kind: String, target: Expr,
                              value: Option[Expr],
                              position: Option[Expr]) extends Expr
  /** Direct XML element constructor `<n a="{e}">{e}</n>`: attr values and
    * content interleave static text with enclosed expressions; the
    * constructed item is the serialized XML string. */
  final case class ElemCtor(name: String,
                            attrs: Seq[(String, Seq[Either[String, Expr]])],
                            content: Seq[Either[String, Expr]]) extends Expr

  /** Direct child expressions of `e` (scope-blind — use [[freeVars]]
    * when binding structure matters). */
  def children(e: Expr): Seq[Expr] = e match {
    case NumLit(_) | StrLit(_) | BoolLit(_) | NullLit | VarRef(_) |
        ContextItem => Nil
    case SeqCtor(xs) => xs
    case ArrayCtor(xs) => xs
    case ObjectCtor(es) => es.map {
      case Left(s) => s
      case Right((_, v)) => v
    }
    case Deref(b, _) => Seq(b)
    case ChildStep(b, _) => Seq(b)
    case DescStep(b, _) => Seq(b)
    case TextStep(b) => Seq(b)
    case AttrStep(b, _) => Seq(b)
    case DerefVar(b, _) => Seq(b)
    case DescendantDeref(b, _) => Seq(b)
    case Unbox(b) => Seq(b)
    case ArrayIndex(b, i) => Seq(b, i)
    case ArraySlice(b, f, u) => Seq(b, f, u)
    case FilterPred(b, p) => Seq(b, p)
    case Binary(_, l, r) => Seq(l, r)
    case Unary(_, x) => Seq(x)
    case Range(f, t) => Seq(f, t)
    case If(c, t, e2) => Seq(c, t, e2)
    case InstanceOf(x, _) => Seq(x)
    case Call(_, args) => args
    case Quantified(bs, p) => bs.map(_._2) :+ p
    case Flwor(cs, ret) => cs.flatMap {
      case ForClause(_, in, _) => Seq(in)
      case LetClause(_, v) => Seq(v)
      case WhereClause(w) => Seq(w)
      case OrderClause(ks) => ks.map(_.key)
      case GroupClause(_) => Nil
      case CountClause(_) => Nil
    } :+ ret
    case UpdateStmt(_, t, v, p) => t +: (v.toSeq ++ p.toSeq)
    case ElemCtor(_, attrs, content) =>
      (attrs.flatMap(_._2) ++ content).collect { case Right(x) => x }
  }

  /** Does any node of `e` (including `e` itself) satisfy `p`? */
  def exprAny(e: Expr)(p: Expr => Boolean): Boolean =
    p(e) || children(e).exists(exprAny(_)(p))

  /** Free variables of `e`; `"$$"` stands for the context item. Binding
    * constructs (FLWOR for/let/position vars, quantifier bindings, a
    * filter predicate's context item) remove their names from the scopes
    * they cover. The compiler's join decorrelation uses this to prove a
    * `for` source reads only statically-bound values. */
  def freeVars(e: Expr): Set[String] = e match {
    case NumLit(_) | StrLit(_) | BoolLit(_) | NullLit => Set.empty
    case VarRef(n) => Set(n)
    case ContextItem => Set("$$")
    case SeqCtor(xs) => xs.flatMap(freeVars).toSet
    case ArrayCtor(xs) => xs.flatMap(freeVars).toSet
    case ObjectCtor(es) => es.flatMap {
      case Left(splat) => freeVars(splat)
      case Right((_, v)) => freeVars(v)
    }.toSet
    case Deref(b, _) => freeVars(b)
    case ChildStep(b, _) => freeVars(b)
    case DescStep(b, _) => freeVars(b)
    case TextStep(b) => freeVars(b)
    case AttrStep(b, _) => freeVars(b)
    case DerefVar(b, v) => freeVars(b) + v
    case DescendantDeref(b, _) => freeVars(b)
    case Unbox(b) => freeVars(b)
    case ArrayIndex(b, i) => freeVars(b) ++ freeVars(i)
    case ArraySlice(b, f, u) => freeVars(b) ++ freeVars(f) ++ freeVars(u)
    case FilterPred(b, p) => freeVars(b) ++ (freeVars(p) - "$$")
    case Binary(_, l, r) => freeVars(l) ++ freeVars(r)
    case Unary(_, x) => freeVars(x)
    case Range(f, t) => freeVars(f) ++ freeVars(t)
    case If(c, t, e2) => freeVars(c) ++ freeVars(t) ++ freeVars(e2)
    case InstanceOf(x, _) => freeVars(x)
    case Call(_, args) => args.flatMap(freeVars).toSet
    case Quantified(bindings, pred) =>
      val (fv, bound) = bindings
        .foldLeft((Set.empty[String], Set.empty[String])) {
          case ((f, b), (v, src)) => (f ++ (freeVars(src) -- b), b + v)
        }
      fv ++ (freeVars(pred) -- bound)
    case Flwor(clauses, ret) =>
      val (fv, bound) = clauses
        .foldLeft((Set.empty[String], Set.empty[String])) {
          case ((f, b), c) => c match {
            case ForClause(v, in, pos) =>
              (f ++ (freeVars(in) -- b), b + v ++ pos)
            case LetClause(v, value) => (f ++ (freeVars(value) -- b), b + v)
            case WhereClause(w) => (f ++ (freeVars(w) -- b), b)
            case OrderClause(keys) =>
              (f ++ (keys.flatMap(k => freeVars(k.key)).toSet -- b), b)
            case GroupClause(keys) => (f ++ (keys.toSet -- b), b)
            case CountClause(v) => (f, b + v)
          }
        }
      fv ++ (freeVars(ret) -- bound)
    case UpdateStmt(_, t, v, p) =>
      freeVars(t) ++ v.toSeq.flatMap(freeVars) ++ p.toSeq.flatMap(freeVars)
    case ElemCtor(_, attrs, content) =>
      (attrs.flatMap(_._2) ++ content).flatMap {
        case Left(_) => Nil
        case Right(x) => freeVars(x)
      }.toSet
  }

  // ------------------------------------------------------------- tokens
  private sealed trait Tok
  private final case class TNum(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TName(s: String) extends Tok // possibly qname a:b
  private final case class TVar(s: String) extends Tok // $name
  private case object TCtx extends Tok // $$
  private final case class TPunct(s: String) extends Tok

  private def tokenize(q: String): Vector[(Tok, Int)] = {
    val out = Vector.newBuilder[(Tok, Int)]
    var i = 0
    val n = q.length
    def isNameStart(c: Char) = c.isLetter || c == '_'
    def isNamePart(c: Char) = c.isLetterOrDigit || c == '_' || c == '-'
    while (i < n) {
      val c = q(i)
      val s0 = i
      if (c.isWhitespace) i += 1
      else if (c == '(' && i + 1 < n && q(i + 1) == ':') { // XQuery comment
        var depth = 1; i += 2
        while (i + 1 < n && depth > 0) {
          if (q(i) == '(' && q(i + 1) == ':') { depth += 1; i += 2 }
          else if (q(i) == ':' && q(i + 1) == ')') { depth -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '"' || c == '\'') {
        val sb = new StringBuilder; i += 1
        while (i < n && q(i) != c) {
          if (q(i) == '\\' && i + 1 < n) { sb.append(unescape(q(i + 1))); i += 2 }
          else { sb.append(q(i)); i += 1 }
        }
        require(i < n, s"unterminated string at offset $i")
        i += 1
        out += ((TStr(sb.toString), s0))
      } else if (c.isDigit) {
        // digits ['.' digits] — at most one dot, and only when followed by
        // a digit ('1.2.3' is a lex error HERE, not a late cast failure;
        // '1.' leaves the dot to the deref tokenizer).
        val j = i
        while (i < n && q(i).isDigit) i += 1
        if (i + 1 < n && q(i) == '.' && q(i + 1).isDigit) {
          i += 1
          while (i < n && q(i).isDigit) i += 1
        }
        require(!(i + 1 < n && q(i) == '.' && q(i + 1).isDigit),
          s"unexpected '.' in number at offset $i")
        // xs:double literals: [eE][+-]?digits (XQuery DoubleLiteral —
        // '2.5e0', '2.05e1'); a bare 'e' not followed by an exponent
        // stays a name token ('2e' never lexes as a number)
        if (i < n && (q(i) == 'e' || q(i) == 'E')) {
          val expEnd =
            if (i + 1 < n && q(i + 1).isDigit) i + 1
            else if (i + 2 < n && (q(i + 1) == '+' || q(i + 1) == '-') &&
              q(i + 2).isDigit) i + 2
            else -1
          if (expEnd > 0) {
            i = expEnd
            while (i < n && q(i).isDigit) i += 1
          }
        }
        out += ((TNum(q.substring(j, i)), s0))
      } else if (isNameStart(c)) {
        val j = i
        while (i < n && isNamePart(q(i))) i += 1
        var name = q.substring(j, i)
        // qname: ns:local (but not `:=`)
        if (i < n && q(i) == ':' && i + 1 < n && isNameStart(q(i + 1))) {
          val k = i + 1; i += 1
          while (i < n && isNamePart(q(i))) i += 1
          name = name + ":" + q.substring(k, i)
        }
        out += ((TName(name), s0))
      } else if (c == '$') {
        if (i + 1 < n && q(i + 1) == '$') { out += ((TCtx, s0)); i += 2 }
        else {
          val j = i + 1; i += 1
          while (i < n && isNamePart(q(i))) i += 1
          require(i > j, s"bare $$ at offset $j")
          out += ((TVar(q.substring(j, i)), s0))
        }
      } else {
        val three = if (i + 3 <= n) q.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) q.substring(i, i + 2) else ""
        if (three == "=>>") { out += ((TPunct("=>>"), s0)); i += 3 }
        else if (Set(":=", "!=", "<=", ">=", "[?", "//", "<<").contains(two)) {
          out += ((TPunct(two), s0)); i += 2
        } else { out += ((TPunct(c.toString), s0)); i += 1 }
      }
    }
    out.result()
  }

  private def unescape(c: Char): String = c match {
    case 'n' => "\n"; case 't' => "\t"; case 'r' => "\r"
    case other => other.toString
  }

  // ------------------------------------------------------------- parser
  def parse(query: String): Expr = {
    val (raw0, defs) = parseProlog(stripComments(query))
    val raw = raw0.trim
    val p = new P(tokenize(raw), raw)
    val e = p.expr()
    p.expectEnd()
    inlineFunctions(e, defs)
  }

  /** A user-declared function (`declare function`): inlined at call
    * sites — the corpus' functions are non-recursive one-liners (XMark
    * q18's local:convert; brackit compiles them natively). */
  final case class FunDef(params: Seq[String], body: Expr)

  /** Remove XQuery `(: ... :)` comments (nesting per spec, ignored
    * inside string literals). */
  /** Strip `(: ... :)` comments (nesting, string-literal aware) — but
    * ONLY where expressions may appear: inside direct element
    * constructor text content `(:` is literal character data
    * (`<a>price (:USD:)</a>` keeps its text), and comment recognition
    * resumes inside `{...}` enclosed expressions. Constructor state is
    * tracked with a mode stack: expression frames (brace-counted when
    * entered from constructor context), tag internals (copied verbatim,
    * attribute values may re-enter expressions), and element content. */
  private val CtorPrecedingKeywords = Set(
    "return", "then", "else", "in", "satisfies", "where", "and", "or",
    "to", "div", "idiv", "mod", "eq", "ne", "lt", "le", "gt", "ge",
    "union", "intersect", "except", "by", "at", "if", "case", "default")

  private def stripComments(q: String): String = {
    val sb = new StringBuilder(q.length)
    // modes: 'E' = expression (value: brace depth; pops at 0 when
    // entered via '{'), 'T' = inside a tag, 'C' = element content.
    // attrQ is the open attribute-value quote of a 'T' frame (per
    // frame: a nested constructor inside an attribute's enclosed
    // expression must not clobber the outer tag's state).
    final case class Frame(mode: Char, var brace: Int, popAtZero: Boolean,
                           var attrQ: Char = ' ')
    val stack = scala.collection.mutable.Stack(Frame('E', 0, false))
    var i = 0
    var comment = 0
    var inStr = false
    var strQ = ' '
    def ctorStart(at: Int): Boolean =
      at + 1 < q.length &&
        (q.charAt(at + 1).isLetter || q.charAt(at + 1) == '_')
    // `<` in expression position is a CONSTRUCTOR only where an
    // expression may BEGIN — after an operator/keyword/opening
    // delimiter. After an operand (variable, literal, ')', ']') it is
    // the general-comparison operator ('$i <count($s)' compares).
    def ctorPosition(): Boolean = {
      var j = sb.length - 1
      while (j >= 0 && sb.charAt(j).isWhitespace) j -= 1
      if (j < 0) true
      else {
        val c2 = sb.charAt(j)
        if ("({[;,=<>+-*|!".indexOf(c2.toInt) >= 0) true
        else if (c2.isLetter) {
          var s2 = j
          while (s2 >= 0 && (sb.charAt(s2).isLetterOrDigit ||
            sb.charAt(s2) == '_' || sb.charAt(s2) == ':')) s2 -= 1
          if (s2 >= 0 && sb.charAt(s2) == '$') false // variable operand
          else CtorPrecedingKeywords(sb.substring(s2 + 1, j + 1))
        } else false
      }
    }
    while (i < q.length) {
      val ch = q.charAt(i)
      if (comment > 0) {
        if (ch == '(' && i + 1 < q.length && q.charAt(i + 1) == ':') {
          comment += 1; i += 2
        } else if (ch == ':' && i + 1 < q.length && q.charAt(i + 1) == ')') {
          comment -= 1; i += 2
        } else i += 1
      } else stack.top.mode match {
        case 'E' =>
          val e = stack.top
          if (inStr) {
            sb.append(ch); if (ch == strQ) inStr = false; i += 1
          } else if (ch == '"' || ch == '\'') {
            inStr = true; strQ = ch; sb.append(ch); i += 1
          } else if (ch == '(' && i + 1 < q.length &&
              q.charAt(i + 1) == ':') {
            comment = 1; i += 2
          } else if (ch == '<' && ctorStart(i) && ctorPosition()) {
            stack.push(Frame('T', 0, false)); sb.append(ch); i += 1
          } else if (ch == '{') {
            e.brace += 1; sb.append(ch); i += 1
          } else if (ch == '}') {
            e.brace -= 1; sb.append(ch); i += 1
            if (e.popAtZero && e.brace == 0) { stack.pop(); () }
          } else { sb.append(ch); i += 1 }
        case 'T' =>
          val tf = stack.top
          if (tf.attrQ != ' ') {
            if ((ch == '{' || ch == '}') && i + 1 < q.length &&
                q.charAt(i + 1) == ch) {
              // doubled-brace ESCAPE in an attribute value: literal
              // character data, not an expression frame
              sb.append(ch); sb.append(ch); i += 2
            } else if (ch == '{') {
              stack.push(Frame('E', 1, true)); sb.append(ch); i += 1
            } else {
              sb.append(ch); if (ch == tf.attrQ) tf.attrQ = ' '; i += 1
            }
          } else if (ch == '"' || ch == '\'') {
            tf.attrQ = ch; sb.append(ch); i += 1
          } else if (ch == '>') {
            sb.append(ch); i += 1
            stack.pop()
            // self-closing tags have no content frame
            if (!(i >= 2 && q.charAt(i - 2) == '/'))
              stack.push(Frame('C', 0, false))
          } else { sb.append(ch); i += 1 }
        case 'C' =>
          if (ch == '<' && q.startsWith("<![CDATA[", i)) {
            // CDATA is verbatim character data: `{` inside it is not an
            // expression frame and `(:` is not a comment
            val end = q.indexOf("]]>", i + 9)
            val stop = if (end < 0) q.length else end + 3
            sb.append(q.substring(i, stop)); i = stop
          } else if ((ch == '{' || ch == '}') && i + 1 < q.length &&
              q.charAt(i + 1) == ch) {
            // doubled-brace escape: literal character data — comments
            // are NOT recognized inside it, so no frame transition
            sb.append(ch); sb.append(ch); i += 2
          } else if (ch == '{') {
            stack.push(Frame('E', 1, true)); sb.append(ch); i += 1
          } else if (ch == '<' && i + 1 < q.length &&
              q.charAt(i + 1) == '/') {
            while (i < q.length && q.charAt(i) != '>') {
              sb.append(q.charAt(i)); i += 1
            }
            if (i < q.length) { sb.append('>'); i += 1 }
            stack.pop(); ()
          } else if (ch == '<' && ctorStart(i)) {
            stack.push(Frame('T', 0, false)); sb.append(ch); i += 1
          } else { sb.append(ch); i += 1 }
      }
    }
    sb.toString
  }

  /** Consume the prolog: `xquery version`, `declare namespace` (both
    * dropped), and `declare function` declarations (collected for
    * inlining). Returns the main-expression text and the functions. */
  private def parseProlog(q0: String): (String, Map[String, FunDef]) = {
    var t = q0
    val defs = Map.newBuilder[String, FunDef]
    var done = false
    while (!done) {
      t = t.dropWhile(_.isWhitespace)
      if (t.startsWith("xquery ") || t.startsWith("xquery\t") ||
          t.startsWith("declare namespace")) {
        val semi = t.indexOf(';')
        require(semi >= 0, "prolog declaration missing ';'")
        t = t.substring(semi + 1)
      } else if (t.startsWith("declare function")) {
        var i = "declare function".length
        def ws(): Unit =
          while (i < t.length && t.charAt(i).isWhitespace) i += 1
        ws()
        val nameStart = i
        while (i < t.length && t.charAt(i) != '(' &&
          !t.charAt(i).isWhitespace) i += 1
        val name = t.substring(nameStart, i)
        ws()
        require(i < t.length && t.charAt(i) == '(',
          s"expected '(' after function name $name")
        val pStart = i + 1
        var depth = 1
        i += 1
        while (depth > 0) {
          t.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val paramText = t.substring(pStart, i - 1).trim
        val params =
          if (paramText.isEmpty) Seq.empty[String]
          else paramText.split(",").toSeq.map { p =>
            val s = p.trim
            require(s.startsWith("$"),
              s"function parameter must start with '$$': $s")
            s.substring(1).takeWhile(c =>
              c.isLetterOrDigit || c == '_' || c == '-')
          }
        // skip the optional `as TYPE` return annotation up to the body
        val bodyStart = t.indexOf('{', i)
        require(bodyStart >= 0, s"function $name: body expected")
        var j = bodyStart + 1
        var d = 1
        var inStr = false
        var strQ = ' '
        while (d > 0) {
          val ch = t.charAt(j)
          if (inStr) { if (ch == strQ) inStr = false }
          else ch match {
            case '"' | '\'' => inStr = true; strQ = ch
            case '{' => d += 1
            case '}' => d -= 1
            case _ =>
          }
          j += 1
        }
        defs += name -> FunDef(params,
          parseEnclosed(t.substring(bodyStart + 1, j - 1)))
        var k = j
        while (k < t.length && t.charAt(k).isWhitespace) k += 1
        if (k < t.length && t.charAt(k) == ';') k += 1
        t = t.substring(k)
      } else done = true
    }
    (t, defs.result())
  }

  /** Rebuild `e` with `f` applied to each direct child (scope-blind). */
  def mapChildren(e: Expr)(f: Expr => Expr): Expr = e match {
    case NumLit(_) | StrLit(_) | BoolLit(_) | NullLit | VarRef(_) |
        ContextItem => e
    case SeqCtor(xs) => SeqCtor(xs.map(f))
    case ArrayCtor(xs) => ArrayCtor(xs.map(f))
    case ObjectCtor(es) => ObjectCtor(es.map {
      case Left(s) => Left(f(s))
      case Right((k, v)) => Right((k, f(v)))
    })
    case Deref(b, fl) => Deref(f(b), fl)
    case ChildStep(b, n) => ChildStep(f(b), n)
    case DescStep(b, n) => DescStep(f(b), n)
    case TextStep(b) => TextStep(f(b))
    case AttrStep(b, n) => AttrStep(f(b), n)
    case DerefVar(b, v) => DerefVar(f(b), v)
    case DescendantDeref(b, fl) => DescendantDeref(f(b), fl)
    case Unbox(b) => Unbox(f(b))
    case ArrayIndex(b, i) => ArrayIndex(f(b), f(i))
    case ArraySlice(b, fr, u) => ArraySlice(f(b), f(fr), f(u))
    case FilterPred(b, p) => FilterPred(f(b), f(p))
    case Binary(op, l, r) => Binary(op, f(l), f(r))
    case Unary(op, x) => Unary(op, f(x))
    case Range(fr, t) => Range(f(fr), f(t))
    case If(c, t, el) => If(f(c), f(t), f(el))
    case InstanceOf(x, t) => InstanceOf(f(x), t)
    case Call(n, as) => Call(n, as.map(f))
    case Quantified(bs, p) =>
      Quantified(bs.map { case (v, src) => (v, f(src)) }, f(p))
    case Flwor(cs, ret) => Flwor(cs.map {
      case ForClause(v, in, pv) => ForClause(v, f(in), pv)
      case LetClause(v, value) => LetClause(v, f(value))
      case WhereClause(w) => WhereClause(f(w))
      case OrderClause(ks) => OrderClause(ks.map(k => k.copy(key = f(k.key))))
      case g: GroupClause => g
      case c: CountClause => c
    }, f(ret))
    case UpdateStmt(k, t, v, p) => UpdateStmt(k, f(t), v.map(f), p.map(f))
    case ElemCtor(n, attrs, content) =>
      ElemCtor(n,
        attrs.map { case (an, ps) => (an, ps.map {
          case Left(s) => Left(s): Either[String, Expr]
          case Right(v) => Right(f(v)): Either[String, Expr]
        }) },
        content.map {
          case Left(s) => Left(s): Either[String, Expr]
          case Right(v) => Right(f(v)): Either[String, Expr]
        })
  }

  /** Rename free occurrences of variables per `m` (binders shadow). */
  def renameVars(e: Expr, m: Map[String, String]): Expr =
    if (m.isEmpty) e
    else e match {
      case VarRef(n) => VarRef(m.getOrElse(n, n))
      case DerefVar(b, v) => DerefVar(renameVars(b, m), m.getOrElse(v, v))
      case Quantified(bs, p) =>
        var cur = m
        val bs2 = bs.map { case (v, src) =>
          val out = (v, renameVars(src, cur)); cur = cur - v; out
        }
        Quantified(bs2, renameVars(p, cur))
      case Flwor(cs, ret) =>
        var cur = m
        val cs2 = cs.map {
          case ForClause(v, in, pv) =>
            val out = ForClause(v, renameVars(in, cur), pv)
            cur = cur - v -- pv; out
          case LetClause(v, value) =>
            val out = LetClause(v, renameVars(value, cur)); cur = cur - v; out
          case WhereClause(w) => WhereClause(renameVars(w, cur))
          case OrderClause(ks) =>
            OrderClause(ks.map(k => k.copy(key = renameVars(k.key, cur))))
          case GroupClause(ks) =>
            // key names are variable USES — rename any still-free ones
            GroupClause(ks.map(n => cur.getOrElse(n, n)))
          case CountClause(v) =>
            val out = CountClause(v); cur = cur - v; out
        }
        Flwor(cs2, renameVars(ret, cur))
      case other => mapChildren(other)(renameVars(_, m))
    }

  private var inlineCounter = 0

  /** Replace calls to declared functions with their bodies: parameters
    * become fresh `let` bindings (argument sequences evaluate once, the
    * XQuery rule) and the body's parameter references are renamed apart
    * so caller variables cannot be captured. Non-recursive (a function
    * calling itself is left unresolved and fails as an unknown call —
    * the corpus declares none). */
  def inlineFunctions(e: Expr, defs: Map[String, FunDef]): Expr = {
    if (defs.isEmpty) return e
    // recursion (direct or mutual) expands DEPTH-CAPPED: each function
    // may appear at most `maxDepth` times on one inlining path; past
    // the cap the call site compiles to a LOUD runtime error
    // (graft:recursion-overflow). A terminating recursion guards the
    // recursive arm behind if-then-else, which compiles to a CASE WHEN
    // evaluated lazily per row — data that bottoms out before the cap
    // never reaches the error arm. brackit compiles recursion natively
    // (the reference's XQuery engine); the cap is this compiler's
    // static-expansion analog.
    val maxDepth = sys.props.get("graft.recursion.depth")
      .map(_.toInt).getOrElse(16)
    // a body with several self-calls (fib-style) expands exponentially
    // in the depth — bound total work, loudly
    val maxExpansions = 100000
    var expansions = 0
    def go(x: Expr, depth: Map[String, Int]): Expr = x match {
      case Call(n, args) if defs.contains(n) =>
        val d = depth.getOrElse(n, 0)
        if (d >= maxDepth) Call("graft:recursion-overflow", Seq(StrLit(n)))
        else {
          val fd = defs(n)
          require(fd.params.size == args.size,
            s"$n expects ${fd.params.size} arguments, got ${args.size}")
          expansions += 1
          if (expansions > maxExpansions)
            throw new UnsupportedOperationException(
              s"recursive user-declared function $n: static expansion " +
                s"exceeds $maxExpansions call sites — lower " +
                "-Dgraft.recursion.depth or rewrite iteratively")
          val id = synchronized { inlineCounter += 1; inlineCounter }
          val fresh = fd.params.map(p => p -> s"${p}__u$id")
          val body = go(renameVars(fd.body, fresh.toMap),
            depth + (n -> (d + 1)))
          val lets = fresh.map(_._2).zip(args.map(go(_, depth)))
            .map { case (fp, a) => LetClause(fp, a) }
          if (lets.isEmpty) body else Flwor(lets, body)
        }
      case other => mapChildren(other)(go(_, depth))
    }
    go(e, Map.empty)
  }

  /** An ENCLOSED expression (element-constructor `{...}`): a top-level
    * comma list is an expression SEQUENCE (XQuery's ExprSequence —
    * XMark q10's `{<id>{$i}</id>, $p}`). */
  private def parseEnclosed(fragment: String): Expr = {
    val raw = stripProlog(fragment)
    val p = new P(tokenize(raw), raw)
    val parts = Seq.newBuilder[Expr]
    parts += p.expr()
    while (p.atComma()) { p.eatComma(); parts += p.expr() }
    p.expectEnd()
    val all = parts.result()
    if (all.size == 1) all.head else SeqCtor(all)
  }

  /** Drop an `xquery version "...";` prolog (XMark queries carry one). */
  private def stripProlog(q: String): String = {
    val t = q.trim
    if (t.startsWith("xquery")) t.substring(t.indexOf(';') + 1) else t
  }

  /** Parse `<name a="..{e}..">content</name>` (or self-closing) starting
    * at `start` (must be '<'); returns the constructor and the offset
    * one past the element. Whitespace-only static content is stripped
    * (XQuery boundary-space default). */
  private def parseRawElem(raw: String, start: Int): (ElemCtor, Int) = {
    var i = start
    require(raw(i) == '<', s"element ctor must start at '<', offset $i")
    i += 1
    def name(): String = {
      val j = i
      while (i < raw.length &&
        (raw(i).isLetterOrDigit || raw(i) == '_' || raw(i) == '-')) i += 1
      require(i > j, s"element name expected at offset $j")
      raw.substring(j, i)
    }
    def ws(): Unit = while (i < raw.length && raw(i).isWhitespace) i += 1
    /** `{expr}` with brace/string nesting; returns the parsed fragment. */
    def braceExpr(): Expr = {
      require(raw(i) == '{')
      val j = i + 1
      var depth = 1
      i += 1
      while (i < raw.length && depth > 0) {
        raw(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1
          case '"' | '\'' =>
            val q = raw(i); i += 1
            while (i < raw.length && raw(i) != q) i += 1
          case _ => ()
        }
        i += 1
      }
      require(depth == 0, "unbalanced '{' in element constructor")
      parseEnclosed(raw.substring(j, i - 1))
    }
    val n = name()
    val attrs = Seq.newBuilder[(String, Seq[Either[String, Expr]])]
    var selfClosed = false
    var scanning = true
    while (scanning) {
      ws()
      raw(i) match {
        case '/' =>
          require(raw(i + 1) == '>', s"expected '/>' at offset $i")
          i += 2; selfClosed = true; scanning = false
        case '>' => i += 1; scanning = false
        case _ =>
          val an = name()
          ws(); require(raw(i) == '=', s"expected '=' after attribute $an"); i += 1
          ws(); require(raw(i) == '"', "attribute value must be double-quoted")
          i += 1
          val parts = Seq.newBuilder[Either[String, Expr]]
          val sb = new StringBuilder
          while (raw(i) != '"') {
            if ((raw(i) == '{' || raw(i) == '}') && i + 1 < raw.length &&
                raw(i + 1) == raw(i)) {
              // {{ / }} escape: one literal brace of character data
              sb.append(raw(i)); i += 2
            } else if (raw(i) == '{') {
              if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
              parts += Right(braceExpr())
            } else { sb.append(raw(i)); i += 1 }
          }
          if (sb.nonEmpty) parts += Left(sb.toString)
          i += 1 // closing quote
          attrs += ((an, parts.result()))
      }
    }
    val content = Seq.newBuilder[Either[String, Expr]]
    if (!selfClosed) {
      val sb = new StringBuilder
      def flush(): Unit = {
        if (sb.toString.trim.nonEmpty) content += Left(sb.toString)
        sb.clear()
      }
      var open = true
      while (open) {
        require(i < raw.length, s"unterminated element <$n>")
        raw(i) match {
          case '{' | '}' if i + 1 < raw.length && raw(i + 1) == raw(i) =>
            // {{ / }} escape: one literal brace of character data
            sb.append(raw(i)); i += 2
          case '{' =>
            flush()
            content += Right(braceExpr())
          case '<' if raw.startsWith("<![CDATA[", i) =>
            // CDATA: verbatim character data (braces and `<` inert)
            val end = raw.indexOf("]]>", i + 9)
            require(end >= 0, s"unterminated CDATA in <$n>")
            sb.append(raw.substring(i + 9, end))
            i = end + 3
          case '<' if raw.startsWith(s"</", i) =>
            flush()
            i += 2
            val closing = name()
            require(closing == n, s"mismatched </$closing> for <$n>")
            ws(); require(raw(i) == '>', "expected '>'"); i += 1
            open = false
          case '<' =>
            flush()
            val (child, end) = parseRawElem(raw, i)
            content += Right(child)
            i = end
          case ch => sb.append(ch); i += 1
        }
      }
    }
    (ElemCtor(n, attrs.result(), content.result()), i)
  }

  private final class P(pairs: Vector[(Tok, Int)], raw: String) {
    private val toks: Vector[Tok] = pairs.map(_._1)
    private val offs: Vector[Int] = pairs.map(_._2)
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def at(s: String): Boolean = peek.contains(TPunct(s))
    private def atName(s: String): Boolean = peek.contains(TName(s))
    private def eat(s: String): Unit = {
      require(at(s) || atName(s), s"expected '$s' at token $pos, got $peek")
      pos += 1
    }
    def expectEnd(): Unit =
      require(pos == toks.length, s"trailing tokens from $pos: ${toks.drop(pos).take(5)}")
    def atComma(): Boolean = at(",")
    def eatComma(): Unit = eat(",")

    def expr(): Expr = peek match {
      case Some(TName("for")) | Some(TName("let")) => flwor()
      case Some(TName("if")) => ifExpr()
      case Some(TName("some")) if toks.lift(pos + 1).exists(_.isInstanceOf[TVar]) =>
        quantified()
      case Some(TName("delete")) if toks.lift(pos + 1).contains(TName("json")) =>
        eat("delete"); eat("json")
        UpdateStmt("delete", orExpr(), None, None)
      case Some(TName("replace")) if toks.lift(pos + 1).contains(TName("json")) =>
        eat("replace"); eat("json"); eat("value"); eat("of")
        val t = orExpr()
        eat("with")
        UpdateStmt("replace", t, Some(orExpr()), None)
      case Some(TName("append")) if toks.lift(pos + 1).contains(TName("json")) =>
        eat("append"); eat("json")
        val v = orExpr()
        eat("into")
        UpdateStmt("append", orExpr(), Some(v), None)
      case Some(TName("insert")) if toks.lift(pos + 1).contains(TName("json")) =>
        eat("insert"); eat("json")
        val v = orExpr()
        eat("into")
        val t = orExpr()
        val p = if (atName("at")) {
          eat("at"); eat("position"); Some(orExpr())
        } else None
        UpdateStmt("insert", t, Some(v), p)
      case Some(TName("rename")) if toks.lift(pos + 1).contains(TName("json")) =>
        eat("rename"); eat("json")
        val t = orExpr()
        eat("as")
        UpdateStmt("rename", t, Some(orExpr()), None)
      case _ => orExpr()
    }

    private def flwor(): Expr = {
      val clauses = Seq.newBuilder[Clause]
      var more = true
      while (more) peek match {
        case Some(TName("for")) =>
          eat("for")
          var again = true
          while (again) {
            val v = varName()
            val posV =
              if (atName("at")) { eat("at"); Some(varName()) } else None
            eat("in")
            clauses += ForClause(v, orExpr(), posV)
            if (at(",")) eat(",") else again = false
          }
        case Some(TName("let")) =>
          eat("let")
          var again = true
          while (again) {
            val v = varName()
            eat(":=")
            clauses += LetClause(v, exprSingleNoFlwor())
            if (at(",")) eat(",") else again = false
          }
        case Some(TName("where")) =>
          eat("where")
          val cond =
            if (atName("some") &&
                toks.lift(pos + 1).exists(_.isInstanceOf[TVar])) quantified()
            else orExpr()
          clauses += WhereClause(cond)
        case Some(TName("order")) =>
          eat("order"); eat("by")
          val keys = Seq.newBuilder[OrderKey]
          var again = true
          while (again) {
            val k = orExpr()
            val desc =
              if (atName("descending")) { eat("descending"); true }
              else { if (atName("ascending")) eat("ascending"); false }
            val emptyLeast =
              if (atName("empty")) {
                eat("empty")
                next() match {
                  case TName("least") => true
                  case TName("greatest") => false
                  case other => throw new IllegalArgumentException(
                    s"expected least/greatest, got $other")
                }
              } else false
            keys += OrderKey(k, desc, emptyLeast)
            if (at(",")) eat(",") else again = false
          }
          clauses += OrderClause(keys.result())
        case Some(TName("group")) =>
          eat("group"); eat("by")
          val keys = Seq.newBuilder[String]
          var again = true
          while (again) {
            keys += varName()
            if (at(",")) eat(",") else again = false
          }
          clauses += GroupClause(keys.result())
        case Some(TName("count"))
            if toks.lift(pos + 1).exists(_.isInstanceOf[TVar]) =>
          eat("count")
          clauses += CountClause(varName())
        case _ => more = false
      }
      eat("return")
      Flwor(clauses.result(), expr())
    }

    /** let-value position: ExprSingle — a nested FLWOR binds greedily
      * (its `return` belongs to the inner FLWOR; XMark q08's
      * `let $a := for ... return $t return <item .../>` shape). */
    private def exprSingleNoFlwor(): Expr = expr()

    private def quantified(): Expr = {
      eat("some")
      val bindings = Seq.newBuilder[(String, Expr)]
      var again = true
      while (again) {
        val v = varName()
        eat("in")
        bindings += ((v, orExpr()))
        if (at(",")) eat(",") else again = false
      }
      eat("satisfies")
      Quantified(bindings.result(), orExpr())
    }

    private def ifExpr(): Expr = {
      eat("if"); eat("(")
      val c = expr()
      eat(")"); eat("then")
      val t = expr()
      eat("else")
      If(c, t, expr())
    }

    private def varName(): String = next() match {
      case TVar(v) => v
      case other => throw new IllegalArgumentException(s"expected variable, got $other")
    }

    private def orExpr(): Expr = {
      var e = andExpr()
      while (atName("or")) { eat("or"); e = Binary("or", e, andExpr()) }
      e
    }
    private def andExpr(): Expr = {
      var e = cmpExpr()
      while (atName("and")) { eat("and"); e = Binary("and", e, cmpExpr()) }
      e
    }
    private val cmpOps = Set("eq", "ne", "lt", "le", "gt", "ge")
    private def cmpExpr(): Expr = {
      val e = instanceExpr()
      peek match {
        case Some(TName(op)) if cmpOps(op) => eat(op); Binary(op, e, instanceExpr())
        case Some(TPunct("<<")) =>
          eat("<<")
          Binary("<<", e, instanceExpr())
        case Some(TPunct(op)) if Set("=", "!=", "<", "<=", ">", ">=")(op) =>
          eat(op)
          // GENERAL comparisons (existential over sequences) keep a
          // distinct op family from the value comparisons eq/ne/...
          val norm = Map("=" -> "g_eq", "!=" -> "g_ne", "<" -> "g_lt",
            "<=" -> "g_le", ">" -> "g_gt", ">=" -> "g_ge")(op)
          Binary(norm, e, instanceExpr())
        case _ => e
      }
    }
    private def instanceExpr(): Expr = {
      val e = rangeExpr()
      if (atName("instance")) {
        eat("instance"); eat("of")
        val tn = next() match {
          case TName(t) => t
          case other => throw new IllegalArgumentException(s"bad type name $other")
        }
        eat("("); eat(")")
        InstanceOf(e, tn)
      } else e
    }
    private def rangeExpr(): Expr = {
      val e = addExpr()
      if (atName("to")) { eat("to"); Range(e, addExpr()) } else e
    }
    private def addExpr(): Expr = {
      var e = mulExpr()
      var more = true
      while (more) peek match {
        case Some(TPunct("+")) => eat("+"); e = Binary("+", e, mulExpr())
        case Some(TPunct("-")) => eat("-"); e = Binary("-", e, mulExpr())
        case _ => more = false
      }
      e
    }
    private def mulExpr(): Expr = {
      var e = unaryExpr()
      var more = true
      while (more) peek match {
        case Some(TPunct("*")) => eat("*"); e = Binary("*", e, unaryExpr())
        case Some(TName("div")) => eat("div"); e = Binary("div", e, unaryExpr())
        case Some(TName("idiv")) => eat("idiv"); e = Binary("idiv", e, unaryExpr())
        case Some(TName("mod")) => eat("mod"); e = Binary("mod", e, unaryExpr())
        case _ => more = false
      }
      e
    }
    private def unaryExpr(): Expr =
      if (at("-")) { eat("-"); Unary("-", postfixExpr()) } else postfixExpr()

    private def postfixExpr(): Expr = {
      var e = primary()
      var more = true
      while (more) peek match {
        case Some(TPunct(".")) =>
          eat(".")
          next() match {
            case TName(f) => e = Deref(e, f)
            case TStr(f) => e = Deref(e, f)
            case TVar(v) => e = DerefVar(e, v)
            case other => throw new IllegalArgumentException(s"bad deref $other")
          }
        case Some(TPunct("=>>")) =>
          eat("=>>")
          next() match {
            case TName(f) => e = DescendantDeref(e, f)
            case TStr(f) => e = DescendantDeref(e, f)
            case other => throw new IllegalArgumentException(s"bad =>> $other")
          }
        case Some(TPunct("[?")) =>
          eat("[?")
          e = FilterPred(e, expr())
          eat("]")
        case Some(TPunct("/")) =>
          eat("/")
          if (at("@")) {
            eat("@")
            e = AttrStep(e, nameTok("attribute step"))
          } else {
            val n = nameTok("child step")
            if (at(":") && toks.lift(pos + 1).contains(TPunct(":"))) {
              eat(":"); eat(":")
              e = axisStep(e, n)
            } else if (n == "text" && at("(")) {
              eat("("); eat(")"); e = TextStep(e)
            } else e = ChildStep(e, n)
          }
        case Some(TPunct("//")) =>
          eat("//")
          e = DescStep(e, nameTok("descendant step"))
        case Some(TPunct("[")) =>
          eat("[")
          if (at("]")) { eat("]"); e = Unbox(e) }
          else {
            val i1 = expr()
            if (at(":")) {
              eat(":")
              e = ArraySlice(e, i1, expr())
            } else e = ArrayIndex(e, i1)
            eat("]")
          }
        case _ => more = false
      }
      e
    }

    /** `axis::test` steps. The temporal axes (reference
      * SirixTranslator.java:208-216 maps XQ.PAST/FUTURE/... onto the
      * temporal axis classes) share their implementation with the jn:*
      * temporal functions in the reference (Past.java calls getPast —
      * the same PastAxis the step uses), so the step forms desugar to
      * the function routes. The structural axes cover the child/
      * descendant/attribute forms the path shorthands already parse. */
    private def axisStep(base: Expr, axis: String): Expr = {
      val test: String = next() match {
        case TPunct("*") => "*"
        case TName(n2) => n2
        case other => throw new IllegalArgumentException(
          s"$axis:: expected a node test, got $other")
      }
      def temporal(call: Expr): Expr = {
        if (test != "*") throw new IllegalArgumentException(
          s"temporal axis $axis:: supports only the * node test, " +
            s"got $test")
        call
      }
      axis match {
        case "past" => temporal(Call("jn:past", Seq(base)))
        case "past-or-self" =>
          temporal(Call("jn:past", Seq(base, BoolLit(true))))
        case "future" => temporal(Call("jn:future", Seq(base)))
        case "future-or-self" =>
          temporal(Call("jn:future", Seq(base, BoolLit(true))))
        case "previous" => temporal(Call("jn:previous", Seq(base)))
        case "next" => temporal(Call("jn:next", Seq(base)))
        case "all-times" => temporal(Call("jn:all-times", Seq(base)))
        case "first" => temporal(Call("jn:first", Seq(base)))
        case "last" => temporal(Call("jn:last", Seq(base)))
        case "child" => ChildStep(base, test)
        case "descendant" => DescStep(base, test)
        case "attribute" => AttrStep(base, test)
        case other => throw new IllegalArgumentException(
          s"unsupported axis $other::")
      }
    }

    private def nameTok(what: String): String = next() match {
      case TName(n) => n
      case other => throw new IllegalArgumentException(s"$what: expected name, got $other")
    }

    /** A variable-reference primary for a computed object key (`$k` in
      * `{$k: v}`) — the only computed-key form the dialect needs. */
    private def expr0Primary(): Expr = next() match {
      case TVar(v) => VarRef(v)
      case other => throw new IllegalArgumentException(
        s"computed object key: expected a variable, got $other")
    }

    /** Direct element constructor: the '<' token was consumed; re-parse
      * CHARACTERWISE from its raw offset (the tokenizer has no XML mode),
      * then resume at the first token past the element's end. Enclosed
      * `{expr}` fragments sub-parse through [[Jsoniq.parse]]. */
    private def elemCtor(): Expr = {
      val start = offs(pos - 1)
      val (e, end) = parseRawElem(raw, start)
      while (pos < toks.length && offs(pos) < end) pos += 1
      e
    }

    private def primary(): Expr = next() match {
      case TNum(s) => NumLit(s)
      case TStr(s) => StrLit(s)
      case TCtx => ContextItem
      case TVar(v) => VarRef(v)
      case TPunct(".") => ContextItem // XPath context item ('let $a := .')
      case TPunct("@") => AttrStep(ContextItem, nameTok("attribute ref"))
      case TPunct("<") => elemCtor()
      case TPunct("(") =>
        if (at(")")) { eat(")"); SeqCtor(Seq.empty) }
        else {
          val items = Seq.newBuilder[Expr]
          items += expr()
          while (at(",")) { eat(","); items += expr() }
          eat(")")
          val all = items.result()
          if (all.size == 1) all.head else SeqCtor(all)
        }
      case TPunct("[") =>
        if (at("]")) { eat("]"); ArrayCtor(Seq.empty) }
        else {
          val items = Seq.newBuilder[Expr]
          items += expr()
          while (at(",")) { eat(","); items += expr() }
          eat("]")
          ArrayCtor(items.result())
        }
      case TPunct("{") =>
        // entries: Left(splat) | Right((static key, value)); a COMPUTED
        // key (`{$k: v}` after group-by — JSONiq's dynamic object key)
        // desugars the whole constructor to the internal graft:object
        // call (key/value pairs flattened), which evaluates keys per
        // tuple. Splats and computed keys don't mix (corpus never does).
        val entries = Seq.newBuilder[Either[Expr, (String, Expr)]]
        val dynPairs = Seq.newBuilder[(Expr, Expr)]
        var anyDyn = false
        if (!at("}")) {
          var again = true
          while (again) {
            peek match {
              case Some(TStr(k)) =>
                pos += 1; eat(":")
                val v = expr()
                entries += Right((k, v)); dynPairs += ((StrLit(k), v))
              case Some(TName(k)) if toks.lift(pos + 1).contains(TPunct(":")) =>
                pos += 1; eat(":")
                val v = expr()
                entries += Right((k, v)); dynPairs += ((StrLit(k), v))
              case Some(TVar(_)) if toks.lift(pos + 1).contains(TPunct(":")) =>
                val k = expr0Primary()
                eat(":")
                anyDyn = true
                dynPairs += ((k, expr()))
              case _ => entries += Left(expr()) // splat: {$i, "k": v}
            }
            if (at(",")) eat(",") else again = false
          }
        }
        eat("}")
        if (anyDyn) {
          val pairs = dynPairs.result()
          val es = entries.result()
          require(es.forall(_.isRight) && es.count(_.isRight) ==
            pairs.count(_._1.isInstanceOf[StrLit]),
            "computed object keys cannot mix with splat entries")
          Call("graft:object", pairs.flatMap { case (k, v) => Seq(k, v) })
        } else ObjectCtor(entries.result())
      case TName("true") =>
        if (at("(")) { eat("("); eat(")") }
        BoolLit(true)
      case TName("false") =>
        if (at("(")) { eat("("); eat(")") }
        BoolLit(false)
      case TName("null") => NullLit
      case TName(name) if at("(") =>
        eat("(")
        val args = Seq.newBuilder[Expr]
        if (!at(")")) {
          args += expr()
          while (at(",")) { eat(","); args += expr() }
        }
        eat(")")
        Call(name, args.result())
      case other =>
        throw new IllegalArgumentException(s"unexpected token $other at $pos")
    }
  }
}
