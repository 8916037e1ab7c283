package graft.query

/** XML documents in the JSONiq front end's variant item model — the
  * reference runs XQuery (XMark) and JSONiq through one compile chain
  * (bundles/sirix-query/src/main/java/io/sirix/query/SirixCompileChain
  * .java); here XML rides the same variant encoding so the XPath-lite
  * steps ([[Jsoniq.ChildStep]] etc.) are ordinary variant operators:
  *
  *   element   {"~n": name, "~a": {attr: value, ...}, "~c": [children]}
  *   text      plain JSON string (whitespace-only nodes KEPT — the XML
  *             data model; stored subtrees re-serialize byte-exactly)
  *   document  {"~n": "", "~a": {}, "~c": [root]} — so `/site` selects
  *             the root element, matching the document-node semantics
  *
  * The `~` prefix cannot collide with XML names ('~' is not a NameChar).
  * Conversion is StAX streaming (the [[graft.sources.XmlShredder]]
  * discipline) into Jackson trees, so escaping is never hand-rolled. */
object XmlItem {

  /** One shreddable child list found DURING the encode: `steps` are the
    * element names from the root element down to (and including) the
    * list's owner, `[start, end)` the `[...]` span in the encoded JSON,
    * `members` the exact member-value spans (elements AND text nodes) —
    * packed (start << 32 | end). Matches what
    * [[JsoniqRun.Store.shredCandidates]] + splitTopLevelArray compute
    * from the finished JSON, without re-scanning it. */
  private[query] final case class ListSpan(
      steps: List[String], start: Int, end: Int,
      members: scala.collection.IndexedSeq[Long]) {
    def count: Int = members.size
  }

  /** Convert one XML document to its item-model JSON encoding. */
  def xmlToJson(xml: String): String =
    xmlToJsonSpans(xml, Int.MaxValue)._1

  /** A Writer over a plain StringBuilder (StringWriter's StringBuffer
    * synchronizes every append). */
  private final class SbWriter(val sb: java.lang.StringBuilder)
      extends java.io.Writer {
    override def write(c: Array[Char], off: Int, len: Int): Unit = {
      sb.append(c, off, len); ()
    }
    override def write(s: String): Unit = { sb.append(s); () }
    override def flush(): Unit = ()
    override def close(): Unit = ()
  }

  /** Encode AND locate the shreddable child lists in ONE StAX pass —
    * the store's former shape paid three O(bytes) driver scans (tree
    * encode + serialize, candidate scan, member split); this streams
    * through a Jackson generator (escaping still never hand-rolled)
    * and captures list/member spans from the writer position as the
    * elements close. A child list qualifies when its span reaches
    * `minBytes` with >= 16 members (the [[JsoniqRun.Store]] selection
    * rule); chain uniqueness and the top-12 cut stay with the caller,
    * which sees every qualifying list. */
  private[query] def xmlToJsonSpans(xml: String, minBytes: Int)
      : (String, Seq[ListSpan]) = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val factory = XMLInputFactory.newInstance()
    // hostile-input discipline: no DTDs, no external entities
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(new java.io.StringReader(xml))
    val sb = new java.lang.StringBuilder(xml.length + (xml.length >> 1))
    val gen = new com.fasterxml.jackson.core.JsonFactory()
      .createGenerator(new SbWriter(sb))
    val track = minBytes != Int.MaxValue
    // writer position WITHOUT a generator flush: span tracking queries
    // the position at every member boundary (~3 per element), and a
    // flush per query made the encoder copy its buffer out millions of
    // times. getOutputBuffered is exact for writer-backed generators
    // (guarded once — a generator that cannot report it flushes as
    // before).
    val buffered = gen.getOutputBuffered >= 0
    def pos(): Int =
      if (buffered) sb.length + gen.getOutputBuffered
      else { gen.flush(); sb.length }
    // one frame per OPEN element (plus the document wrapper): the
    // pending member-start of the element within ITS parent's list,
    // the offset of its own `[` (child list), and its member spans
    final class Frame(val name: String, val memberStart: Int,
                      val listStart: Int) {
      val members = new scala.collection.mutable.ArrayBuffer[Long]()
    }
    var stack = List.empty[Frame]
    val found = Seq.newBuilder[ListSpan]
    def openFrame(name: String, memberStart: Int): Unit = {
      gen.writeStartObject()
      gen.writeStringField("~n", name)
      gen.writeFieldName("~a")
      gen.writeStartObject()
      if (name.nonEmpty) {
        val n = reader.getAttributeCount
        if (n == 1)
          gen.writeStringField(reader.getAttributeLocalName(0),
            reader.getAttributeValue(0))
        else if (n > 1) {
          // namespaced attributes sharing a local name (a:x, b:x) must
          // not emit duplicate JSON keys — parse_json rejects them.
          // LinkedHashMap.put = first occurrence's position, last value,
          // exactly the former tree encode's ObjectNode.put semantics.
          val attrs = new java.util.LinkedHashMap[String, String]()
          var i = 0
          while (i < n) {
            attrs.put(reader.getAttributeLocalName(i),
              reader.getAttributeValue(i))
            i += 1
          }
          val it = attrs.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            gen.writeStringField(e.getKey, e.getValue)
          }
        }
      }
      gen.writeEndObject()
      gen.writeFieldName("~c")
      gen.writeStartArray()
      // `[` is the character just written
      stack = new Frame(name, memberStart, if (track) pos() - 1 else -1) ::
        stack
    }
    // a member value's start: the writer position, plus one for the
    // `,` the generator emits with the NEXT value (never the first)
    def memberStartPos(): Int =
      if (!track) -1
      else pos() + (if (stack.head.members.nonEmpty) 1 else 0)
    def closeFrame(): Unit = {
      val f = stack.head
      stack = stack.tail
      gen.writeEndArray()
      if (track) {
        val listEnd = pos() // exclusive of nothing: `]` just written
        if (listEnd - f.listStart >= minBytes && f.members.size >= 16)
          found += ListSpan(
            // steps = element names root-element..this (doc "" excluded)
            (f.name :: stack.collect {
              case fr if fr.name.nonEmpty => fr.name
            }).reverse,
            f.listStart, listEnd, f.members)
      }
      gen.writeEndObject()
      if (stack.nonEmpty && track)
        stack.head.members += ((f.memberStart.toLong << 32) | pos().toLong)
      ()
    }
    val text = new StringBuilder
    def flushText(): Unit = {
      val t = text.toString
      text.clear()
      // ALL text survives, including whitespace-only nodes — the XML
      // data model (and the reference's store) keeps them, and q13-style
      // re-serialization of stored subtrees must be byte-exact
      if (t.nonEmpty) {
        val s0 = memberStartPos()
        gen.writeString(t)
        if (track)
          stack.head.members += ((s0.toLong << 32) | pos().toLong)
        ()
      }
    }
    try {
      openFrame("", -1) // the document wrapper
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            flushText()
            openFrame(reader.getLocalName, memberStartPos())
          case XMLStreamConstants.END_ELEMENT =>
            flushText()
            closeFrame()
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            text.append(reader.getText); ()
          case _ => ()
        }
      }
      closeFrame() // the document wrapper
      gen.close()
    } finally reader.close()
    (sb.toString, found.result())
  }

  /** XQuery string-value of one item (JSON text): an element (XmlItem
    * encoding) concatenates its descendant TEXT nodes in document
    * order; scalars are their lexical text. Returned JSON-quoted. */
  private[query] def stringValueJson(json: String): String = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val mapper = new ObjectMapper()
    val sb = new StringBuilder
    def walk(n: JsonNode): Unit = {
      if (n.isObject && n.has("~c")) {
        val it = n.get("~c").elements()
        while (it.hasNext) walk(it.next())
      } else if (n.isTextual) sb.append(n.asText())
      else if (n.isValueNode && !n.isNull) sb.append(n.asText())
    }
    walk(mapper.readTree(json))
    mapper.writeValueAsString(sb.toString)
  }

  /** Driver-side inverse of [[xmlToJson]]: serialize an item-model
    * node back to XML text — same rendering as the executor-side
    * [[graft.functions.XmlSerialize]] (document nodes unwrap, empty
    * elements self-close, text/attribute escaping). Used by the
    * driver-bounded XML routes (xml:diff shreds two revisions' XML). */
  private[query] def jsonToXml(json: String): String = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root = new ObjectMapper().readTree(json)
    val sb = new java.lang.StringBuilder()
    def escText(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '&' => sb.append("&amp;"); ()
          case '<' => sb.append("&lt;"); ()
          case '>' => sb.append("&gt;"); ()
          case c => sb.append(c); ()
        }
        i += 1
      }
    }
    def emit(e: JsonNode): Unit = {
      val name = e.get("~n").asText()
      sb.append('<').append(name)
      val attrs = e.get("~a")
      if (attrs != null && attrs.isObject) {
        val it = attrs.fields()
        while (it.hasNext) {
          val f = it.next()
          sb.append(' ').append(f.getKey).append("=\"")
          val raw = f.getValue.asText("")
          var j = 0
          while (j < raw.length) {
            raw.charAt(j) match {
              case '&' => sb.append("&amp;"); ()
              case '<' => sb.append("&lt;"); ()
              case '"' => sb.append("&quot;"); ()
              case c => sb.append(c); ()
            }
            j += 1
          }
          sb.append('"')
        }
      }
      val kids = e.get("~c")
      val size = if (kids != null && kids.isArray) kids.size() else 0
      if (size == 0) { sb.append("/>"); return }
      sb.append('>')
      var i = 0
      while (i < size) {
        val k = kids.get(i)
        if (k.isTextual) escText(k.asText())
        else if (k.isObject && k.has("~n")) emit(k)
        i += 1
      }
      sb.append("</").append(name).append('>')
    }
    if (root.isObject && root.has("~n")) {
      if (root.get("~n").asText().isEmpty) {
        val kids = root.get("~c")
        if (kids != null && kids.isArray) {
          val it = kids.elements()
          while (it.hasNext) {
            val k = it.next()
            if (k.isTextual) escText(k.asText())
            else if (k.isObject && k.has("~n")) emit(k)
          }
        }
      } else emit(root)
    }
    sb.toString
  }

  /** Pre-order descendant elements named `name` within `json` (an
    * item-model node); matches recurse into matched subtrees, XPath's
    * `//name` over descendant-or-self. Returns encoded JSON per match. */
  private[query] def walkElements(json: String, name: String): Seq[String] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val mapper = new ObjectMapper()
    val out = Seq.newBuilder[String]
    def walk(node: JsonNode): Unit = {
      if (node.isObject && node.has("~n")) {
        if (node.get("~n").asText() == name)
          out += mapper.writeValueAsString(node)
        val cs = node.get("~c")
        if (cs != null) { val it = cs.elements(); while (it.hasNext) walk(it.next()) }
      }
    }
    // start at the node itself (descendant-or-self axis base): its
    // children are walked through the ~c recursion
    walk(mapper.readTree(json))
    out.result()
  }
}
