package graft.query

import com.fasterxml.jackson.databind.JsonNode

/** Textual XML index scans over stored XML resources (reference
  * function/xml/XMLFun.java:148-181 — xml:create/find/scan-name/path/
  * cas-index, xml:sort-by-doc-order; the scan iterators under
  * function/xml/index/scan/). The reference scans red-black-tree
  * indexes of text/attribute values keyed by path class; here the
  * pattern evaluates against the [[XmlItem]] encoding — driver-walked
  * under the scan cap for small documents, and per-member across
  * executors when every pattern is provably member-local in a shredded
  * element chain ([[XmlMemberXScan]]).
  *
  * Pattern dialect (reference io.brackit.query.util.path.Path):
  * `/a/b/c` anchored element path, `//b/c` match-anywhere (suffix),
  * `*` any element, trailing `@name` / `@*` an attribute, and
  * descendant gaps ANYWHERE (`/a//b/c` — b/c at any depth under a;
  * brackit's Path accepts interior descendant steps the same way). */
private[query] object XmlScan {

  sealed trait Seg extends Serializable
  final case class SegElem(name: String) extends Seg
  final case class SegAttr(name: String) extends Seg

  /** `groups` are the `//`-separated child-step runs: `/a/b//c/d`
    * parses to groups [[a,b],[c,d]], anchored; a leading `//` makes
    * the head group float too. Matching anchors the head (when
    * `anchored`) and the TAIL (the last group ends at the matched
    * node); interior groups match as an ordered subsequence with
    * arbitrary (>= 0) element gaps at each `//`. */
  final case class Pattern(anchored: Boolean, groups: List[List[Seg]])
      extends Serializable {
    def segs: List[Seg] = groups.flatten
    def attrLast: Option[String] = segs.lastOption.collect {
      case SegAttr(n) => n
    }
    def elemNames: List[String] = segs.collect { case SegElem(n) => n }
    /** The pattern with a trailing attribute step removed (the owning
      * element's path pattern). */
    def dropAttr: Pattern =
      if (groups.nonEmpty && groups.last.lastOption.exists(_.isInstanceOf[SegAttr]))
        copy(groups = groups.init :+ groups.last.init)
      else this
    require(segs.zipWithIndex.forall {
      case (SegAttr(_), i) => i == segs.length - 1
      case _ => true
    }, "attribute step only allowed last in an index path")
  }

  def parse(p: String): Pattern = {
    val anchored = !p.startsWith("//")
    val body = if (anchored) p.stripPrefix("/") else p.stripPrefix("//")
    val groups = body.split("//", -1).toList.map(
      _.split("/").toList.filter(_.nonEmpty).map { s =>
        if (s.startsWith("@")) SegAttr(s.drop(1)): Seg
        else SegElem(s): Seg
      })
    Pattern(anchored, groups)
  }

  /** Does the ELEMENT part of the pattern match the element path
    * (names from the root, inclusive)? The head group anchors at the
    * root when `anchored` (else floats — the reference Path's
    * descendant-prefix semantics for `//a/b`), the LAST group must end
    * exactly at the path's end, and each `//` gap admits any number of
    * intermediate elements. */
  def elemMatches(pat: Pattern, path: List[String]): Boolean = {
    val egroups = pat.groups.map(_.collect { case SegElem(n) => n })
    def fits(g: List[String], p: List[String]): Boolean =
      p.length >= g.length &&
        p.zip(g).forall { case (a, b) => b == "*" || a == b }
    def gapped(gs: List[List[String]], p: List[String]): Boolean =
      gs match {
        case Nil => p.isEmpty
        case g :: tail =>
          p.tails.exists(t => fits(g, t) && gapped(tail, t.drop(g.length)))
      }
    egroups match {
      case Nil => path.isEmpty
      case g :: tail if pat.anchored =>
        fits(g, path) && gapped(tail, path.drop(g.length))
      case _ => gapped(egroups, path)
    }
  }

  /** What a scan collects at matching positions. Serializable — the
    * distributed member walk ships one. */
  sealed trait Mode extends Serializable
  /** CAS: TEXT-node values (element patterns) / attribute values
    * (trailing `@` patterns) passing the typed comparison; hits are
    * the VALUES as string items. */
  final case class XCas(cmp: JsonPath.ValueCmp) extends Mode
  /** Path: matching ELEMENT nodes (attribute patterns unsupported). */
  case object XPath extends Mode
  /** Name: elements named in the set (None = every element). */
  final case class XName(names: Option[Set[String]]) extends Mode

  private def quote(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  /** Document-order walk collecting scan hits as ITEM jsons (a text /
    * attribute hit is a JSON string; an element hit is its XmlItem
    * object). `basePath` seeds the element path for member-rooted
    * walks (the element itself is NOT re-added — pass its full path). */
  def walk(rootElem: JsonNode, basePath: List[String],
           patterns: Option[Seq[Pattern]], mode: Mode): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def pats: Seq[Pattern] = patterns.getOrElse(Nil)
    def visit(e: JsonNode, path: List[String]): Unit = {
      if (!e.isObject || !e.has("~n")) return
      mode match {
        case XCas(cmp) =>
          // attributes first (the reference's in-element order), then
          // text children at THIS element's path, recursing in order
          val as = e.get("~a")
          if (as != null && as.isObject) {
            val it = as.fields()
            while (it.hasNext) {
              val a = it.next()
              val hit = pats.exists(p => p.attrLast.exists(an =>
                (an == "*" || an == a.getKey) &&
                  elemMatches(p.dropAttr, path)))
              if (hit && cmp(a.getValue.asText("")))
                out += quote(a.getValue.asText(""))
            }
          }
        case XPath =>
          if (pats.exists(p => p.attrLast.isEmpty && elemMatches(p, path)))
            out += e.toString
        case XName(names) =>
          val nm = e.get("~n").asText()
          if (names.forall(_.contains(nm))) out += e.toString
      }
      val cs = e.get("~c")
      if (cs != null && cs.isArray) {
        val it = cs.elements()
        while (it.hasNext) {
          val ch = it.next()
          if (ch.isTextual) mode match {
            case XCas(cmp) =>
              val hit = pats.exists(p =>
                p.attrLast.isEmpty && elemMatches(p, path))
              if (hit && cmp(ch.asText())) out += quote(ch.asText())
            case _ => ()
          } else if (ch.isObject && ch.has("~n"))
            visit(ch, path :+ ch.get("~n").asText())
        }
      }
    }
    visit(rootElem, basePath)
    out.toSeq
  }

  /** Walk a STORED document's item tree: the document wrapper
    * (`~n == ""`, [[XmlItem]]'s document-node encoding) contributes
    * nothing itself — its element children walk with their own names
    * as the path root. */
  def walkDoc(doc: JsonNode, patterns: Option[Seq[Pattern]],
              mode: Mode): Seq[String] =
    if (doc.isObject && doc.has("~n") && doc.get("~n").asText() == "") {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cs = doc.get("~c")
      if (cs != null && cs.isArray) {
        val it = cs.elements()
        while (it.hasNext) {
          val ch = it.next()
          if (ch.isObject && ch.has("~n"))
            out ++= walk(ch, List(ch.get("~n").asText()), patterns, mode)
        }
      }
      out.toSeq
    } else if (doc.isObject && doc.has("~n"))
      walk(doc, List(doc.get("~n").asText()), patterns, mode)
    else Seq.empty

  /** Is every pattern provably local to members of the given element
    * chain (so the member tables alone serve the scan COMPLETELY)?
    * Requires: anchored, fully concrete (no wildcards), the element
    * part strictly longer than the chain, AND the HEAD group covering
    * the whole chain — so every `//` gap sits strictly inside the
    * member suffix. (A gap inside the chain prefix — `/site//age`
    * with chain [site, people] — could match along sibling branches
    * the member tables don't cover, so it stays on the driver walk.) */
  def memberLocal(pat: Pattern, chain: List[String]): Boolean =
    pat.anchored &&
      pat.segs.forall {
        case SegElem(n) => n != "*"
        case SegAttr(n) => n != "*"
      } &&
      pat.elemNames.length > chain.length &&
      pat.groups.headOption.exists(g =>
        g.collect { case SegElem(n) => n }.take(chain.length) == chain)
}
