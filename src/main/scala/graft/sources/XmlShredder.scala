package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** XML shredder (SURVEY.md §2.1 XML shredder row; reference:
  * bundles/sirix-core/src/main/java/io/sirix/service/xml/shredder/
  * XmlShredder.java — streaming StAX parse into element/attribute/text
  * node records with document-order keys).
  *
  * The Spark analog shreds a column of XML documents into a flat NODE
  * TABLE — the same relational encoding the JSON side uses, so every
  * structural operator already in the library applies unchanged:
  *
  *  - `ordpath` (DeweyID analog, [[graft.operators.Ordpath]]): document
  *    order, ancestor/descendant = array-prefix tests, sibling = same
  *    parent prefix.
  *  - `node_key` / `parent_key`: doc-local document-order numbers widened
  *    with the doc id — parent/child joins are plain equi-joins.
  *
  * Parsing runs inside `mapPartitions` with one StAX reader per partition
  * — per-document imperative parsing is the one shape Catalyst expressions
  * genuinely cannot express (same justification as the multimodal decode
  * kernel). Each task shreds its split of documents independently: at
  * 100 TB the parallelism is document-count-bound with no shuffle at all —
  * the row-per-node explosion happens map-side, exactly like the
  * reference's per-document shredder transactions (XmlShredder.java runs
  * one wtx per document).
  *
  * Node kinds: element, attribute, text, comment, pi, namespace — the
  * full first-class set of the reference's XML node model
  * (node/NodeKind.java:103; CommentNode.java, PINode.java,
  * NamespaceNode.java) — so a comment/PI-bearing corpus round-trips
  * losslessly instead of silently dropping those nodes. Element and
  * attribute names keep their prefix (`x:a`), namespace declarations
  * become child nodes (name = prefix or null for the default namespace,
  * value = URI).
  *
  * Tag-internal ordering is CANONICALIZED: serialization emits namespace
  * declarations before attributes (the XML C14N order, which is also the
  * reference's namespace-before-attribute key order). StAX reports the
  * two as separate lists and does not preserve their interleaving, so a
  * document written `<r a="1" xmlns:x="u">` round-trips to the
  * canonical-equivalent `<r xmlns:x="u" a="1">` — same infoset,
  * different bytes. Documents already in canonical order (and any
  * shred→serialize output, which is canonical by construction)
  * round-trip byte-identically.
  *
  * Node encoding (namespaces then attributes precede child content, like
  * the reference's attribute-before-first-child key order):
  * {{{
  * <r id="5"><name>X</name></r>  →
  *   kind=element   name=r     value=null ordpath=[1]     seq=1 parent=0
  *   kind=attribute name=id    value=5    ordpath=[1,1]   seq=2 parent=1
  *   kind=element   name=name  value=null ordpath=[1,2]   seq=3 parent=1
  *   kind=text      name=null  value=X    ordpath=[1,2,1] seq=4 parent=3
  * }}}
  */
object XmlShredder {

  /** One shredded node. `node_seq`/`parent_seq` are doc-local document-
    * order numbers (root's parent is 0); `node_key`/`parent_key` widen
    * them with the doc id into globally unique join keys. */
  final case class XmlNode(doc_id: Long, node_seq: Int, parent_seq: Int,
                           kind: String, name: String, value: String,
                           ordpath: Seq[Int])

  private val MaxNodesPerDoc = 1 << 20 // key-widening headroom (2^20 nodes/doc)

  /** Shred `xmlCol` of `df` into the node table. Whitespace-only text is
    * dropped (the shredder's ignorable-whitespace behavior); DTDs and
    * external entities are disabled (untrusted input). */
  def shred(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nodes: Dataset[XmlNode] = df
      .select(col(idCol).cast("long"), col(xmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
        f.setProperty("javax.xml.stream.isSupportingExternalEntities", java.lang.Boolean.FALSE)
        it.flatMap { case (docId, xml) => parseOne(f, docId, xml) }
      }
    // key widening needs |doc_id| < 2^43 (node_key = doc_id·2^20 + seq
    // must not wrap — hash-derived 64-bit ids would silently collide
    // across documents); fail loudly instead
    val guarded = nodes.toDF().withColumn("doc_id",
      when(abs(col("doc_id")) < lit(1L << 43), col("doc_id"))
        .otherwise(raise_error(concat(lit("doc_id out of key-widening range (|id| < 2^43): "),
          col("doc_id")))))
    guarded
      .withColumn("node_key", col("doc_id") * MaxNodesPerDoc + col("node_seq"))
      .withColumn("parent_key",
        when(col("parent_seq") === 0, lit(null).cast("long"))
          .otherwise(col("doc_id") * MaxNodesPerDoc + col("parent_seq")))
  }

  private def parseOne(f: javax.xml.stream.XMLInputFactory, docId: Long,
                       xml: String): Iterator[XmlNode] = {
    import javax.xml.stream.XMLStreamConstants._
    val out = Seq.newBuilder[XmlNode]
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    try {
      var seq = 0
      // (element seq, ordpath, next child slot) for each open element
      var stack = List.empty[(Int, List[Int], Int)]
      // top-level slot counter: comments/PIs can precede or follow the
      // root element, and each top-level node needs its own ordpath
      var topSlot = 1
      def nextSlot(): (Int, List[Int]) = stack match {
        case (pSeq, pPath, slot) :: rest =>
          stack = (pSeq, pPath, slot + 1) :: rest
          (pSeq, pPath :+ slot)
        case Nil =>
          val s = topSlot; topSlot += 1
          (0, List(s))
      }
      // prefixed name (the reference keeps QNames on ElementNode/
      // AttributeNode — local name alone would round-trip `<x:a>` lossily)
      def qname(prefix: String, local: String): String =
        if (prefix == null || prefix.isEmpty) local else s"$prefix:$local"
      val text = new StringBuilder
      def flushText(): Unit = if (text.nonEmpty) {
        val t = text.toString; text.clear()
        if (t.exists(!_.isWhitespace)) {
          val (pSeq, path) = nextSlot()
          seq += 1
          out += XmlNode(docId, seq, pSeq, "text", null, t, path)
        }
      }
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            flushText()
            val (pSeq, path) = nextSlot()
            seq += 1
            val elemSeq = seq
            out += XmlNode(docId, elemSeq, pSeq, "element",
              qname(r.getPrefix, r.getLocalName), null, path)
            var slot = 1
            // namespace declarations first (reference key order: the
            // NamespaceNode delegate precedes attributes), then attributes
            (0 until r.getNamespaceCount).foreach { i =>
              seq += 1
              out += XmlNode(docId, seq, elemSeq, "namespace",
                Option(r.getNamespacePrefix(i)).filter(_.nonEmpty).orNull,
                r.getNamespaceURI(i), path :+ slot)
              slot += 1
            }
            (0 until r.getAttributeCount).foreach { i =>
              seq += 1
              out += XmlNode(docId, seq, elemSeq, "attribute",
                qname(r.getAttributePrefix(i), r.getAttributeLocalName(i)),
                r.getAttributeValue(i), path :+ slot)
              slot += 1
            }
            stack = (elemSeq, path, slot) :: stack
          case END_ELEMENT =>
            flushText()
            stack = stack.tail
          case CHARACTERS | CDATA => text.append(r.getText)
          case COMMENT =>
            // first-class node kind (reference node/xml/CommentNode.java)
            flushText()
            val (pSeq, path) = nextSlot()
            seq += 1
            out += XmlNode(docId, seq, pSeq, "comment", null, r.getText, path)
          case PROCESSING_INSTRUCTION =>
            // reference node/xml/PINode.java: target is the name, data the value
            flushText()
            val (pSeq, path) = nextSlot()
            seq += 1
            out += XmlNode(docId, seq, pSeq, "pi", r.getPITarget,
              Option(r.getPIData).getOrElse(""), path)
          case _ => ()
        }
      }
      require(seq < MaxNodesPerDoc, s"document $docId exceeds $MaxNodesPerDoc nodes")
      out.result().iterator
    } finally r.close()
  }

  /** Serialize a shredded node table back to XML text, one row per doc —
    * the inverse check (reference: service/xml/serialize/XmlSerializer).
    * Per-doc assembly is a `mapGroups` over the doc's nodes in document
    * order (doc-sized state, distributed by doc id). */
  def serialize(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    nodes.select(col("doc_id"), col("node_seq"), col("parent_seq"),
        col("kind"), col("name"), col("value"), col("ordpath"))
      .as[(Long, Int, Int, String, String, String, Seq[Int])]
      .groupByKey(_._1)
      .mapGroups { (docId, it) =>
        val ns = it.toArray.sortBy(_._2) // document order = node_seq
        val bySeq = ns.map(n => n._2 -> n).toMap // node_seq need not be contiguous
        val children = ns.groupBy(_._3)
        def render(seq: Int): String = {
          val n = bySeq(seq)
          val kids = children.getOrElse(seq, Array.empty)
          n._4 match {
            case "text" => escape(n._6)
            case "comment" => s"<!--${n._6}-->" // raw: '--' cannot occur inside
            case "pi" =>
              if (n._6 == null || n._6.isEmpty) s"<?${n._5}?>"
              else s"<?${n._5} ${n._6}?>"
            case "attribute" | "namespace" => "" // rendered by the parent element
            case "element" =>
              val attrs = kids.collect {
                case ns if ns._4 == "namespace" =>
                  val prefix = if (ns._5 == null) "xmlns" else s"xmlns:${ns._5}"
                  s""" $prefix="${escape(ns._6)}""""
                case a if a._4 == "attribute" =>
                  s""" ${a._5}="${escape(a._6)}""""
              }.mkString
              val body = kids
                .filter(k => k._4 != "attribute" && k._4 != "namespace")
                .map(k => render(k._2)).mkString
              if (body.isEmpty) s"<${n._5}$attrs/>"
              else s"<${n._5}$attrs>$body</${n._5}>"
          }
        }
        // roots = parent 0 OR parent not present (filtered node subsets)
        val roots = ns.filter(n => !bySeq.contains(n._3))
        (docId, roots.map(r => render(r._2)).mkString)
      }
      .toDF("doc_id", "xml")
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
