package graft.ext

import org.apache.spark.sql.DataFrame

/** PDF text extraction — the other big crawl front door next to HTML
  * ([[TextStats.withHtmlText]]): every web-corpus pipeline runs one
  * (CommonCrawl's PDF share is a top-five mime type). This is a
  * JVM-only STRUCTURAL extractor: it genuinely parses the PDF object
  * layer — header, stream objects, `/FlateDecode` inflation
  * (`java.util.zip`), balanced dictionaries — and interprets the
  * content-stream text operators (`Tj`, `'`, `"`, `TJ` with the
  * standard kerning-gap heuristic, `Td`/`TD`/`T*` line moves) with
  * full literal-string escape handling (octal, nested parens, line
  * continuations) and hex strings.
  *
  * Honest scope, same discipline as the media decode seam
  * ([[Multimodal.FrameHasher]]): string bytes decode as UTF-8
  * (Latin-1 fallback per byte via the replacement policy below);
  * CID/Type0 composite fonts whose bytes are code points into an
  * embedded CMap are OUT of scope — a production deployment puts a
  * full font-aware extractor (pdfium via JNI, Tika) behind the same
  * `payload → text` seam without touching the Spark plumbing.
  * Recovery-mode parsing by design: streams are found by a linear
  * byte scan, not by following the xref table, so a truncated or
  * xref-corrupt file still yields the text of every intact content
  * stream — the behavior crawl extractors actually want. Page order
  * is document order, which is how virtually all real-world writers
  * emit pages (and how [[PdfFixture]] writes them).
  *
  * Scale shape: a pure per-payload function (`mapPartitions`, codec
  * class — same justification as the image/audio/video decoders):
  * no shuffle, no state, embarrassingly parallel over any corpus
  * partitioning; decode cost is linear in payload bytes.
  */
object Pdf {

  /** Extracted text of one PDF payload, or None when the payload is
    * not a PDF (no `%PDF-` header). A well-formed PDF with no text
    * operators yields Some(""). Output is raw operator order — one
    * string per text-showing op, newline between line moves/blocks —
    * callers normalize whitespace downstream (the driver query does). */
  def extractText(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.length < 5) return None
    val head = new String(payload, 0, math.min(payload.length, 8), "ISO-8859-1")
    if (!head.startsWith("%PDF-")) return None
    val out = new StringBuilder
    streams(payload).foreach { s =>
      appendContentText(s, out)
    }
    Some(out.result())
  }

  /** Every decoded stream body in document order: linear scan for
    * `<<dict>> stream\n … endstream`, inflating when the dict says
    * `/FlateDecode`. A `stream` keyword only counts when a balanced
    * dictionary carrying `/Length` immediately precedes it — that is
    * what distinguishes a real stream object from the word "stream"
    * inside page TEXT or inside another stream's compressed bytes —
    * and the declared length bounds the body (scan fallback when the
    * declared length is corrupt). Undecodable deflate bodies are
    * skipped, not fatal (recovery-mode contract). */
  private def streams(payload: Array[Byte]): Seq[Array[Byte]] = {
    val text = new String(payload, "ISO-8859-1") // byte-preserving
    val lengthRe = "/Length\\s+(\\d+)".r
    val found = Seq.newBuilder[Array[Byte]]
    var from = 0
    while (from >= 0 && from < text.length) {
      val sk = text.indexOf("stream", from)
      if (sk < 0) from = -1
      else {
        val dict = dictBefore(text, sk)
        val declared = lengthRe.findFirstMatchIn(dict).map(_.group(1).toLong)
        if (declared.isEmpty) from = sk + "stream".length
        else {
          // stream keyword is followed by CRLF or LF per spec
          var body0 = sk + "stream".length
          if (body0 < text.length && text.charAt(body0) == '\r') body0 += 1
          if (body0 < text.length && text.charAt(body0) == '\n') body0 += 1
          val len = declared.get
          val byLen = body0 + len
          val end =
            if (len >= 0 && byLen <= text.length &&
                text.startsWith("endstream", skipEol(text, byLen.toInt)))
              byLen.toInt
            else { // corrupt /Length: fall back to the delimiter scan
              var e = text.indexOf("endstream", body0)
              if (e < 0) -1
              else {
                if (e > body0 && text.charAt(e - 1) == '\n') e -= 1
                if (e > body0 && text.charAt(e - 1) == '\r') e -= 1
                e
              }
            }
          if (end < 0) from = -1
          else {
            val raw = java.util.Arrays.copyOfRange(payload, body0, end)
            val decoded =
              if (dict.contains("/FlateDecode")) inflate(raw) else Some(raw)
            decoded.foreach { b => found += b; () }
            from = text.indexOf("endstream", end) match {
              case -1 => -1
              case e => e + "endstream".length
            }
          }
        }
      }
    }
    found.result()
  }

  private def skipEol(text: String, i: Int): Int = {
    var j = i
    if (j < text.length && text.charAt(j) == '\r') j += 1
    if (j < text.length && text.charAt(j) == '\n') j += 1
    j
  }

  /** The balanced `<< … >>` dictionary ending nearest before `pos`
    * (empty string when the stream keyword has none — tolerated). */
  private def dictBefore(text: String, pos: Int): String = {
    var i = pos - 1
    while (i >= 0 && Character.isWhitespace(text.charAt(i))) i -= 1
    if (i < 1 || text.charAt(i) != '>' || text.charAt(i - 1) != '>') return ""
    var depth = 0
    var j = i
    while (j >= 1) {
      if (text.charAt(j) == '>' && text.charAt(j - 1) == '>') {
        depth += 1; j -= 2
      } else if (text.charAt(j) == '<' && text.charAt(j - 1) == '<') {
        depth -= 1
        if (depth == 0) return text.substring(j - 1, i + 1)
        j -= 2
      } else j -= 1
    }
    ""
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val bos = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled
      }
      if (inf.finished()) Some(bos.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Word-gap heuristic for `TJ` kerning numbers: a leftward
    * adjustment of at least 180 thousandths of an em reads as an
    * inter-word gap (the threshold every practical extractor uses —
    * typical word spaces are ~250, kerning tweaks are tens). */
  private val TjGapThreshold = -180.0

  /** Interpret one decoded stream as a content stream, appending the
    * text its `Tj`/`'`/`"`/`TJ` operators show. Streams with no
    * text-showing operators (fonts, images, xref streams) contribute
    * nothing — safe to feed every stream through. */
  private def appendContentText(stream: Array[Byte], out: StringBuilder): Unit = {
    val n = stream.length
    var i = 0
    // operands since the last operator: decoded strings and numbers,
    // in order (exactly what TJ needs)
    var pending = List.empty[Either[String, Double]]
    def emitPending(withGaps: Boolean): Unit = {
      pending.reverse.foreach {
        case Left(s) => out.append(s); ()
        case Right(num) =>
          if (withGaps && num <= TjGapThreshold) out.append(' ')
          ()
      }
      pending = Nil
    }
    while (i < n) {
      val c = stream(i).toChar
      if (Character.isWhitespace(c)) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && stream(i) != '\n' && stream(i) != '\r') i += 1
      } else if (c == '(') {
        val (s, next) = literalString(stream, i)
        pending ::= Left(s); i = next
      } else if (c == '<' && i + 1 < n && stream(i + 1).toChar == '<') {
        i = skipDict(stream, i)
      } else if (c == '<') {
        val (s, next) = hexString(stream, i)
        pending ::= Left(s); i = next
      } else if (c == '[' || c == ']') i += 1
      else if (c == '/') { // name object
        i += 1
        while (i < n && !isDelimiter(stream(i).toChar)) i += 1
      } else if (c == '-' || c == '+' || c == '.' || Character.isDigit(c)) {
        val start = i
        i += 1
        while (i < n && (Character.isDigit(stream(i).toChar) ||
            stream(i).toChar == '.')) i += 1
        val num = new String(stream, start, i - start, "ISO-8859-1")
        try pending ::= Right(num.toDouble)
        catch { case _: NumberFormatException => }
      } else {
        val start = i
        i += 1
        while (i < n && !isDelimiter(stream(i).toChar)) i += 1
        val op = new String(stream, start, i - start, "ISO-8859-1")
        op match {
          case "Tj" | "'" | "\"" => emitPending(withGaps = false)
          case "TJ" => emitPending(withGaps = true)
          case "Td" | "TD" | "T*" | "BT" | "ET" =>
            pending = Nil
            // line moves and text-block boundaries separate words
            if (out.nonEmpty && out.last != '\n') out.append('\n')
            ()
          case _ => pending = Nil
        }
      }
    }
  }

  /** Skip a balanced inline `<< … >>` dictionary in a content
    * stream. Returns the index just past the closing `>>`. */
  private def skipDict(stream: Array[Byte], open: Int): Int = {
    var i = open
    var depth = 0
    val n = stream.length
    while (i < n) {
      if (i + 1 < n && stream(i) == '<' && stream(i + 1) == '<') {
        depth += 1; i += 2
      } else if (i + 1 < n && stream(i) == '>' && stream(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    n
  }

  private def isDelimiter(c: Char): Boolean =
    Character.isWhitespace(c) || "()<>[]{}/%".indexOf(c.toInt) >= 0

  /** Literal string `(…)`: balanced nested parens, backslash escapes
    * (`\n \r \t \b \f \( \) \\`, 1–3 digit octal, line-continuation
    * backslash-EOL). Returns (decoded-as-UTF-8, index past `)`). */
  private def literalString(stream: Array[Byte], open: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = open + 1
    var depth = 1
    val n = stream.length
    while (i < n && depth > 0) {
      val b = stream(i)
      b.toChar match {
        case '\\' if i + 1 < n =>
          val e = stream(i + 1).toChar
          e match {
            case 'n' => bytes.write('\n'); i += 2
            case 'r' => bytes.write('\r'); i += 2
            case 't' => bytes.write('\t'); i += 2
            case 'b' => bytes.write('\b'); i += 2
            case 'f' => bytes.write('\f'); i += 2
            case '(' => bytes.write('('); i += 2
            case ')' => bytes.write(')'); i += 2
            case '\\' => bytes.write('\\'); i += 2
            case '\r' => // continuation: swallow EOL
              i += 2; if (i < n && stream(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && stream(i) >= '0' && stream(i) <= '7') {
                v = v * 8 + (stream(i) - '0'); i += 1; k += 1
              }
              bytes.write(v & 0xFF)
            case other => bytes.write(other.toInt); i += 2
          }
        case '(' => depth += 1; bytes.write(b.toInt); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) bytes.write(b.toInt)
          i += 1
        case _ => bytes.write(b.toInt); i += 1
      }
    }
    (new String(bytes.toByteArray, "UTF-8"), i)
  }

  /** Hex string `<…>`: whitespace ignored, odd final digit padded
    * with 0 per spec. Returns (decoded-as-UTF-8, index past `>`). */
  private def hexString(stream: Array[Byte], open: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = open + 1
    val n = stream.length
    while (i < n && stream(i).toChar != '>') {
      val c = stream(i).toChar
      if (!Character.isWhitespace(c)) sb.append(c)
      i += 1
    }
    if (i < n) i += 1 // past '>'
    val hex = if (sb.length % 2 == 1) sb.append('0').result() else sb.result()
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    (new String(bytes, "UTF-8"), i)
  }

  /** Per-payload extraction over a binary column — the codec-class
    * `mapPartitions` frame function (same shape as
    * [[Multimodal.imageDHashes]]): adds `outCol` (extracted text,
    * null for non-PDF payloads) and `outCol_ok` (header recognized). */
  def withPdfText(df: DataFrame, payloadCol: String,
                  outCol: String = "text_pdf"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, StringType}
    val outSchema = df.schema
      .add(outCol, StringType, nullable = true)
      .add(s"${outCol}_ok", BooleanType, nullable = false)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(payloadIdx)) null
          else row.getAs[Array[Byte]](payloadIdx)
        val t = extractText(payload)
        Row.fromSeq(row.toSeq :+ t.orNull :+ Boolean.box(t.isDefined))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic VALID-PDF fixtures — the sandbox instance of the
    * extraction seam, the way GVID is for video: a complete PDF 1.4
    * writer (catalog → page tree → per-page FlateDecoded content
    * streams → font → correct xref + trailer; any conforming reader
    * opens these) whose text layer round-trips through
    * [[extractText]], so a DuckDB oracle can replay the expected
    * output from the planted text alone. */
  object PdfFixture {

    /** Escape one text chunk into PDF literal-string bytes: UTF-8
      * encode, then escape the three structural bytes — safe at the
      * byte level because `( ) \` never occur inside UTF-8 multibyte
      * sequences. */
    private def lit(s: String): String = {
      val b = new StringBuilder
      s.getBytes("UTF-8").foreach { byte =>
        val c = (byte & 0xFF).toChar
        if (c == '(' || c == ')' || c == '\\') { b.append('\\'); b.append(c) }
        else b.append(c)
        ()
      }
      b.result()
    }

    private def deflate(s: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s); d.finish()
      val bos = new java.io.ByteArrayOutputStream(s.length)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        bos.write(buf, 0, n)
      }
      d.end()
      bos.toByteArray
    }

    /** One content stream per page: each page's lines land as
      * separate `Tj` ops under distinct `Td` moves (12pt leading). */
    private def pageContent(lines: Seq[String]): Array[Byte] = {
      val body = lines.zipWithIndex.map { case (l, k) =>
        s"BT /F1 12 Tf 72 ${720 - 14 * k} Td (${lit(l)}) Tj ET"
      }.mkString("\n")
      body.getBytes("ISO-8859-1")
    }

    /** A complete PDF whose page `k` shows `pages(k)`'s lines.
      * `compress = false` leaves content streams raw (both decode
      * paths are real and both are exercised by the driver query).
      * `rawContent` substitutes a verbatim content stream for page 0
      * (the fixture hook for TJ-kerning and hex-string cases). */
    def pdf(pages: Seq[Seq[String]], compress: Boolean = true,
            rawContent: Option[String] = None): Array[Byte] = {
      require(pages.nonEmpty, "pdf: no pages")
      val nPages = pages.length
      // object ids: 1 catalog, 2 pages, 3 font, then per page:
      // (4 + 2k) page object, (5 + 2k) content stream
      val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      objs += 1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1")
      val kids = (0 until nPages).map(k => s"${4 + 2 * k} 0 R").mkString(" ")
      objs += 2 -> s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
        .getBytes("ISO-8859-1")
      objs += 3 -> ("<< /Type /Font /Subtype /Type1 " +
        "/BaseFont /Helvetica >>").getBytes("ISO-8859-1")
      pages.zipWithIndex.foreach { case (lines, k) =>
        val pageId = 4 + 2 * k
        val contId = 5 + 2 * k
        objs += pageId -> (s"<< /Type /Page /Parent 2 0 R " +
          s"/MediaBox [0 0 612 792] /Contents $contId 0 R " +
          s"/Resources << /Font << /F1 3 0 R >> >> >>")
          .getBytes("ISO-8859-1")
        val content0 =
          if (k == 0 && rawContent.isDefined)
            rawContent.get.getBytes("ISO-8859-1")
          else pageContent(lines)
        val (body, filter) =
          if (compress) (deflate(content0), " /Filter /FlateDecode")
          else (content0, "")
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(s"<< /Length ${body.length}$filter >>\nstream\n"
          .getBytes("ISO-8859-1"))
        bos.write(body)
        bos.write("\nendstream".getBytes("ISO-8859-1"))
        objs += contId -> bos.toByteArray
        ()
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
      val offsets = scala.collection.mutable.Map.empty[Int, Int]
      objs.sortBy(_._1).foreach { case (id, body) =>
        offsets(id) = out.size()
        out.write(s"$id 0 obj\n".getBytes("ISO-8859-1"))
        out.write(body)
        out.write("\nendobj\n".getBytes("ISO-8859-1"))
        ()
      }
      val xrefAt = out.size()
      val maxId = objs.map(_._1).max
      val sb = new StringBuilder
      sb.append(s"xref\n0 ${maxId + 1}\n0000000000 65535 f \n")
      (1 to maxId).foreach { id =>
        sb.append(f"${offsets(id)}%010d 00000 n \n"); ()
      }
      sb.append(s"trailer\n<< /Size ${maxId + 1} /Root 1 0 R >>\n")
      sb.append(s"startxref\n$xrefAt\n%%EOF\n")
      out.write(sb.result().getBytes("ISO-8859-1"))
      out.toByteArray
    }

    /** Attach fixture PDFs to an id frame executor-side: page 1 is
      * the document's text, page 2 a deterministic footer — the shape
      * [[graft.ops.ExtQueries]]' `q_text_pdf` oracle replays. */
    def withPayloads(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
      import org.apache.spark.sql.{Encoders, Row}
      import org.apache.spark.sql.types.BinaryType
      val outSchema = df.schema.add("payload", BinaryType, nullable = false)
      val idIdx = df.schema.fieldIndex(idCol)
      val textIdx = df.schema.fieldIndex(textCol)
      df.mapPartitions { rows =>
        rows.map { row =>
          val id = row.getLong(idIdx)
          val text = if (row.isNullAt(textIdx)) "" else row.getString(textIdx)
          val payload = pdf(Seq(
            Seq(text),
            Seq(s"Page 2 of doc $id")))
          Row.fromSeq(row.toSeq :+ payload)
        }
      }(Encoders.row(outSchema))
    }
  }
}
