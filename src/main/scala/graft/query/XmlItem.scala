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

  /** Convert one XML document to its item-model JSON encoding. */
  def xmlToJson(xml: String): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val mapper = new ObjectMapper()
    def newElem(name: String): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("~n", name)
      o.set[ObjectNode]("~a", mapper.createObjectNode())
      o.set[ObjectNode]("~c", mapper.createArrayNode())
      o
    }
    val factory = XMLInputFactory.newInstance()
    // hostile-input discipline: no DTDs, no external entities
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(new java.io.StringReader(xml))
    val doc = newElem("")
    var stack = List[ObjectNode](doc)
    val text = new StringBuilder
    def flushText(): Unit = {
      val t = text.toString
      text.clear()
      // ALL text survives, including whitespace-only nodes — the XML
      // data model (and the reference's store) keeps them, and q13-style
      // re-serialization of stored subtrees must be byte-exact
      if (t.nonEmpty)
        stack.head.withArray[ArrayNode]("~c").add(t)
    }
    try while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          flushText()
          val e = newElem(reader.getLocalName)
          val attrs = e.get("~a").asInstanceOf[ObjectNode]
          (0 until reader.getAttributeCount).foreach { i =>
            attrs.put(reader.getAttributeLocalName(i), reader.getAttributeValue(i))
          }
          stack.head.withArray[ArrayNode]("~c").add(e)
          stack = e :: stack
        case XMLStreamConstants.END_ELEMENT =>
          flushText()
          stack = stack.tail
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text.append(reader.getText)
        case _ => ()
      }
    } finally reader.close()
    mapper.writeValueAsString(doc)
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
