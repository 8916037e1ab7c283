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

  /** Encode AND locate the shreddable child lists — parallel across
    * driver cores when the document has one dominant child list and no
    * constructs a textual chunk split cannot preserve (see
    * [[parallelXmlToJsonSpans]]); byte-identical serial fallback
    * otherwise. The serial path was the engine's last single-threaded
    * O(document) store phase (VERDICT r16 next-round #5; guide §7 —
    * at 100 TB every XML store serialized through one core). */
  private[query] def xmlToJsonSpans(xml: String, minBytes: Int)
      : (String, Seq[ListSpan]) =
    parallelXmlToJsonSpans(xml, minBytes).getOrElse {
      val (j, s, _) = xmlToJsonSpansSerial(xml, minBytes)
      (j, s)
    }

  /** Encode AND locate the shreddable child lists in ONE StAX pass —
    * the store's former shape paid three O(bytes) driver scans (tree
    * encode + serialize, candidate scan, member split); this streams
    * through a Jackson generator (escaping still never hand-rolled)
    * and captures list/member spans from the writer position as the
    * elements close. A child list qualifies when its span reaches
    * `minBytes` with >= 16 members (the [[JsoniqRun.Store]] selection
    * rule); chain uniqueness and the top-12 cut stay with the caller,
    * which sees every qualifying list.
    *
    * Parallel-encode hooks (no effect at the defaults): with
    * `containerOrdinal` >= 0, the (0-based) `containerOrdinal`-th
    * START_ELEMENT is the parallel container — its frame and every
    * frame still open when it closes record their ListSpan REGARDLESS
    * of qualification (the stitcher re-filters with fixed-up spans),
    * and the returned Int is the writer position just after the
    * container's `[` (the splice point; -1 otherwise). With
    * `recordRoot`, the outermost ELEMENT's frame always records (a
    * chunk's synthetic root must surface its members even when the
    * chunk is small). */
  private[query] def xmlToJsonSpansSerial(xml: String, minBytes: Int,
                                          containerOrdinal: Int = -1,
                                          recordRoot: Boolean = false)
      : (String, Seq[ListSpan], Int) = {
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
                      val listStart: Int, val isContainer: Boolean) {
      val members = new scala.collection.mutable.ArrayBuffer[Long]()
      var force: Boolean = false
    }
    var stack = List.empty[Frame]
    val found = Seq.newBuilder[ListSpan]
    var elemOrd = -1
    var insertPosOut = -1
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
      if (name.nonEmpty) elemOrd += 1
      val isContainer = name.nonEmpty && elemOrd == containerOrdinal
      // `[` is the character just written
      stack = new Frame(name, memberStart,
        if (track) pos() - 1 else -1, isContainer) :: stack
      if (isContainer) insertPosOut = pos()
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
      // every frame open when the parallel container closes has a span
      // straddling the splice point — the stitcher must re-qualify it
      // with fixed-up lengths, so it records unconditionally
      if (f.isContainer) stack.foreach(_.force = true)
      if (track) {
        val listEnd = pos() // exclusive of nothing: `]` just written
        if ((listEnd - f.listStart >= minBytes && f.members.size >= 16) ||
            f.force || f.isContainer ||
            (recordRoot && stack.size == 1 && f.name.nonEmpty))
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
    (sb.toString, found.result(), insertPosOut)
  }

  /** Parallel encode: a cheap textual pre-scan picks the document's
    * dominant child list (the container), its children chunk at element
    * boundaries across a driver pool, each chunk encodes through the
    * UNCHANGED serial machinery under a synthetic root, and the outer
    * structure (document minus container content) encodes once more
    * serially; the stitcher splices chunk bytes at the container's `[`
    * and shifts every span by prefix sums. Byte-identical to the serial
    * encode by construction (same StAX reader, same Jackson generator
    * per fragment). None = shape or constructs the textual split cannot
    * preserve — DTD/comments/CDATA/PIs (their handling is positional),
    * namespace prefixes (fragments would lose the binding), no dominant
    * container, or a small document; the caller falls back to serial. */
  private[query] def parallelXmlToJsonSpans(xml: String, minBytes: Int)
      : Option[(String, Seq[ListSpan])] = {
    if (minBytes == Int.MaxValue) return None // span-free callers stay serial
    val parMin = sys.props.get("graft.xml.parallelMin")
      .map(_.toInt).getOrElse(8 << 20)
    if (xml.length < parMin) return None
    // prolog allowed; any other markup declaration/PI/comment/CDATA
    // (and DOCTYPE) is positional state the chunk split cannot carry
    var at = 0
    while (at < xml.length && xml.charAt(at).isWhitespace) at += 1
    if (xml.startsWith("<?xml", at)) {
      val e = xml.indexOf("?>", at)
      if (e < 0) return None
      at = e + 2
    }
    if (xml.indexOf("<!", at) >= 0 || xml.indexOf("<?", at) >= 0) return None

    // ---- pass A: depth scan; find the element with the most direct
    // element children (the container) and its content span ----------
    final class Open(val ord: Int, val contentStart: Int) {
      var children = 0
    }
    var i = at
    var ord = -1
    var stack = List.empty[Open]
    var bestOrd = -1
    var bestChildren = 0
    var bestStart = 0
    var bestEnd = 0
    while (i < xml.length) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = xml.length }
      else if (lt + 1 >= xml.length) return None
      else if (xml.charAt(lt + 1) == '/') {
        val gt = xml.indexOf('>', lt)
        if (gt < 0 || stack.isEmpty) return None
        val f = stack.head
        stack = stack.tail
        if (f.children > bestChildren) {
          bestChildren = f.children; bestOrd = f.ord
          bestStart = f.contentStart; bestEnd = lt
        }
        i = gt + 1
      } else {
        // scan the tag; quotes guard '>' inside attribute values, and
        // a ':' OUTSIDE quotes is a namespaced name — fragments would
        // lose the prefix binding, so the parallel path declines
        var j = lt + 1
        var quote = 0.toChar
        var selfClosing = false
        var gt = -1
        while (gt < 0) {
          if (j >= xml.length) return None
          val c = xml.charAt(j)
          if (quote != 0) { if (c == quote) quote = 0.toChar }
          else if (c == '"' || c == '\'') quote = c
          else if (c == ':') return None
          else if (c == '>') {
            gt = j
            selfClosing = xml.charAt(j - 1) == '/'
          }
          j += 1
        }
        ord += 1
        stack.headOption.foreach(_.children += 1)
        if (!selfClosing) stack = new Open(ord, gt + 1) :: stack
        i = gt + 1
      }
    }
    if (stack.nonEmpty) return None // malformed: let the parser throw serially
    if (bestOrd < 0 || bestChildren < 64 ||
        (bestEnd - bestStart) < xml.length / 4) return None

    // ---- pass B: direct child ELEMENT start offsets of the container
    val childStarts = new scala.collection.mutable.ArrayBuffer[Int](bestChildren)
    i = bestStart
    var depth = 0
    while (i < bestEnd) {
      val lt = xml.indexOf('<', i)
      if (lt < 0 || lt >= bestEnd) { i = bestEnd }
      else if (xml.charAt(lt + 1) == '/') { depth -= 1; i = xml.indexOf('>', lt) + 1 }
      else {
        if (depth == 0) childStarts += lt
        var j = lt + 1
        var quote = 0.toChar
        var selfClosing = false
        var gt = -1
        while (gt < 0) {
          val c = xml.charAt(j)
          if (quote != 0) { if (c == quote) quote = 0.toChar }
          else if (c == '"' || c == '\'') quote = c
          else if (c == '>') { gt = j; selfClosing = xml.charAt(j - 1) == '/' }
          j += 1
        }
        if (!selfClosing) depth += 1
        i = gt + 1
      }
    }
    if (childStarts.size < 64) return None

    // ---- chunking: contiguous child runs of ~equal bytes ------------
    val cores = Runtime.getRuntime.availableProcessors()
    val nChunks = math.max(2, math.min(2 * cores, childStarts.size / 16))
    val targetBytes = math.max(1, (bestEnd - bestStart) / nChunks)
    val bounds = new scala.collection.mutable.ArrayBuffer[Int]() // chunk starts
    bounds += bestStart
    var nextCut = bestStart + targetBytes
    childStarts.foreach { cs =>
      if (cs > bounds.head && cs >= nextCut && cs > bounds.last) {
        bounds += cs
        nextCut = cs + targetBytes
      }
    }
    val chunkSpans = bounds.zipAll(bounds.drop(1), 0, bestEnd)
      .map { case (s, e) => (s, e) }

    // ---- parallel chunk encodes + the serial outer encode -----------
    // a chunk encodes as document-wrapper { r { content } } — strip both
    val RootPrefix =
      "{\"~n\":\"\",\"~a\":{},\"~c\":[{\"~n\":\"r\",\"~a\":{},\"~c\":["
    val RootSuffix = "]}]}"
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(nChunks, cores))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val chunkF = chunkSpans.map { case (s, e) => Future {
        val wrapped = "<r>" + xml.substring(s, e) + "</r>"
        val (j, spans, _) = xmlToJsonSpansSerial(wrapped, minBytes,
          recordRoot = true)
        require(j.startsWith(RootPrefix) && j.endsWith(RootSuffix),
          "chunk encode shape")
        (j.substring(RootPrefix.length, j.length - RootSuffix.length), spans)
      }}
      // outer: document with the container's content removed; the
      // container is the `bestOrd`-th START_ELEMENT in both texts
      // (the prefix keeps every element before its content intact)
      val outerXml = xml.substring(0, bestStart) + xml.substring(bestEnd)
      val (outerJson, outerSpans, insertPos) =
        xmlToJsonSpansSerial(outerXml, minBytes, containerOrdinal = bestOrd)
      val chunks = chunkF.map(Await.result(_, Duration.Inf))
      if (insertPos < 0) return None // container not seen: bail to serial
      // splice bytes: outer[0, insertPos) ++ join(chunks, ",") ++ rest
      val joined = new java.lang.StringBuilder(
        xml.length + (xml.length >> 1))
      joined.append(outerJson, 0, insertPos)
      var k = 0
      val chunkBase = new Array[Int](chunks.size)
      chunks.foreach { case (content, _) =>
        if (k > 0) joined.append(',')
        chunkBase(k) = joined.length()
        joined.append(content)
        k += 1
      }
      val totalLen = joined.length() - insertPos
      joined.append(outerJson, insertPos, outerJson.length)
      // ---- span fixups ------------------------------------------------
      def shift(p: Int): Int = if (p > insertPos) p + totalLen else p
      def shiftPacked(m: Long): Long = {
        val s = (m >>> 32).toInt; val e = (m & 0xFFFFFFFFL).toInt
        (shift(s).toLong << 32) | shift(e).toLong
      }
      val out = Seq.newBuilder[ListSpan]
      var containerSteps: List[String] = Nil
      var containerStart = -1
      outerSpans.foreach { ls =>
        if (ls.start == insertPos - 1) {
          // the container's own (empty) frame: members come from chunks
          containerSteps = ls.steps; containerStart = ls.start
        } else {
          val members = ls.members.map(shiftPacked)
          val s2 = ls.start // list starts never equal insertPos (that
          val e2 = shift(ls.end) // position is inside the container's [])
          if (e2 - shift(s2) >= minBytes && members.size >= 16)
            out += ListSpan(ls.steps, shift(s2), e2, members)
        }
      }
      val containerMembers =
        scala.collection.mutable.ArrayBuffer.empty[Long]
      chunks.zipWithIndex.foreach { case ((_, spans), ci) =>
        val delta = chunkBase(ci) - RootPrefix.length
        spans.foreach { ls =>
          if (ls.steps == List("r"))
            containerMembers ++= ls.members.map { m =>
              val s = (m >>> 32).toInt + delta
              val e = (m & 0xFFFFFFFFL).toInt + delta
              (s.toLong << 32) | e.toLong
            }
          else {
            val steps2 = containerSteps ++ ls.steps.drop(1)
            val ms = ls.members.map { m =>
              val s = (m >>> 32).toInt + delta
              val e = (m & 0xFFFFFFFFL).toInt + delta
              (s.toLong << 32) | e.toLong
            }
            if (ls.end - ls.start >= minBytes && ms.size >= 16)
              out += ListSpan(steps2, ls.start + delta, ls.end + delta, ms)
          }
        }
      }
      val containerEnd = insertPos + totalLen + 1 // the `]` after splice
      if (containerStart >= 0 &&
          containerEnd - containerStart >= minBytes &&
          containerMembers.size >= 16)
        out += ListSpan(containerSteps, containerStart, containerEnd,
          containerMembers)
      Some((joined.toString, out.result()))
    } catch {
      // any surprise (a fragment the gates missed, a shape assertion)
      // falls back to the serial encode rather than failing the store
      case scala.util.control.NonFatal(_) => None
    } finally { pool.shutdown(); () }
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
