package graft.scrape

import scala.collection.mutable.ArrayBuffer

/** Minimal tolerant HTML scanning utilities — zero dependencies, pure
  * functions over the raw page string, built for single-pass use inside
  * `mapPartitions` (SURVEY.md §4: the HTML extractor is the sanctioned
  * imperative exception; everything downstream is DataFrame ops).
  *
  * This is NOT a general HTML parser: it covers exactly the shapes
  * baseball-reference pages use (attribute lookup, comment-wrapped
  * tables, tag stripping, entity decode) as exercised by the reference
  * (deep-field scraping/bbref_pages.py).
  */
object Html {

  /** Decode the small entity set that appears in the pages; numeric
    * references handled generally. `&nbsp;` becomes a plain space,
    * mirroring the reference's `.replace(u"\xa0", u" ")`.
    */
  def decode(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val repl: Option[String] = ent match {
            case "nbsp" => Some(" ")
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(e.drop(1).toInt)))
              catch { case _: Exception => None }
            case _ => None
          }
          repl match {
            case Some(r) => out.append(r); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Remove all tags, keeping text content. Handles unclosed trailing
    * tags tolerantly.
    */
  def stripTags(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) out.append(c)
      i += 1
    }
    out.toString
  }

  /** Visible text of an HTML fragment: tags stripped, entities decoded. */
  def text(fragment: String): String = decode(stripTags(fragment))

  /** All HTML comments (`<!-- ... -->`) in document order. BBRef hides
    * real tables inside comments next to `<div class="placeholder">`.
    */
  def comments(html: String): Iterator[String] = new Iterator[String] {
    private var pos = html.indexOf("<!--")
    def hasNext: Boolean = pos >= 0 && html.indexOf("-->", pos + 4) >= 0
    def next(): String = {
      val end = html.indexOf("-->", pos + 4)
      val c = html.substring(pos + 4, end)
      pos = html.indexOf("<!--", end + 3)
      c
    }
  }

  /** Comments anchored by `<div class="placeholder">` markers: for each
    * placeholder div, the first comment following it, in document order.
    * BBRef hides its real tables inside exactly these comments, and the
    * reference instantiates tables from the placeholder rather than by
    * scanning all comments (bbref_pages.py:187-226 _PlaceholderTable /
    * _PlaceholderDivFilter) — a stray comment elsewhere on the page that
    * happens to mention a table must never be mistaken for one.
    */
  def placeholderComments(html: String): Iterator[String] = {
    val marker = "class=\"placeholder\""
    val buf = ArrayBuffer.empty[String]
    var i = html.indexOf(marker)
    while (i >= 0) {
      val c0 = html.indexOf("<!--", i)
      if (c0 >= 0) {
        val c1 = html.indexOf("-->", c0 + 4)
        if (c1 >= 0) buf += html.substring(c0 + 4, c1)
      }
      i = html.indexOf(marker, i + marker.length)
    }
    buf.iterator
  }

  /** Value of attribute `name` in a raw tag string like
    * `<td class="x" data-stat="outs">`; supports single/double quotes.
    */
  def attr(tag: String, name: String): Option[String] = {
    val k = name + "="
    var i = tag.indexOf(k)
    while (i >= 0) {
      val before = if (i == 0) ' ' else tag.charAt(i - 1)
      if (before == ' ' || before == '\t' || before == '\n') {
        val qi = i + k.length
        if (qi < tag.length && (tag.charAt(qi) == '"' || tag.charAt(qi) == '\'')) {
          val q = tag.charAt(qi)
          val end = tag.indexOf(q, qi + 1)
          if (end > qi) return Some(tag.substring(qi + 1, end))
        }
        return None
      }
      i = tag.indexOf(k, i + 1)
    }
    None
  }

  /** Open tags of `tagName` with their inner HTML, scanning flat (no
    * nesting of the same tag expected, as in table cells/rows). Returns
    * (attrString, innerHtml) pairs in document order.
    */
  def elements(html: String, tagName: String): Iterator[(String, String)] = {
    val open = "<" + tagName
    val close = "</" + tagName + ">"
    val buf = ArrayBuffer.empty[(String, String)]
    var i = html.indexOf(open)
    while (i >= 0) {
      val afterName = i + open.length
      // must be followed by space, '>' or '/' (avoid <tr matching <track>)
      if (afterName < html.length &&
          (html.charAt(afterName) == ' ' || html.charAt(afterName) == '>' ||
           html.charAt(afterName) == '\t' || html.charAt(afterName) == '\n')) {
        val tagEnd = html.indexOf('>', i)
        if (tagEnd < 0) return buf.iterator
        val bodyEnd = html.indexOf(close, tagEnd + 1)
        if (bodyEnd < 0) {
          buf += ((html.substring(i, tagEnd + 1), ""))
          i = html.indexOf(open, tagEnd + 1)
        } else {
          buf += ((html.substring(i, tagEnd + 1), html.substring(tagEnd + 1, bodyEnd)))
          i = html.indexOf(open, bodyEnd + close.length)
        }
      } else {
        i = html.indexOf(open, i + 1)
      }
    }
    buf.iterator
  }

  /** First `<a href="...">text</a>` inside a fragment. */
  def firstAnchor(fragment: String): Option[(String, String)] = {
    elements(fragment, "a").toSeq.headOption.flatMap { case (tag, inner) =>
      attr(tag, "href").map(h => (h, text(inner)))
    }
  }
}
