package graft.extract

import graft.{SourceFile, Triple}

/** One rule extractor = one prompt-template family of the reference
  * re-expressed as a deterministic function SourceFile => Seq[Triple]
  * (SURVEY.md §2.4; stance §7.3: deterministic rules behind the same
  * pooled-instance interface an LLM client would use).
  *
  * Instances are created once per partition (see Extraction) so the
  * compiled regexes are shared across all rows of a task — the Spark
  * analog of the reference's per-provider client instance
  * (/root/reference/python.py:89-111).
  */
trait RuleExtractor extends Serializable {
  /** Predicate this extractor emits; also its provenance name. */
  def name: String
  def appliesTo(lang: String): Boolean = true

  /** `splitLines` is the content split ONCE by the extraction pass and
    * shared by every extractor — at 10^12 files, re-splitting per
    * extractor would multiply the dominant allocation cost by the
    * registry size.
    */
  def extract(f: SourceFile, splitLines: Array[String]): Seq[Triple]

  /** Convenience for tests/single use. */
  final def extract(f: SourceFile): Seq[Triple] =
    extract(f, RuleExtractor.split(f.content))

  protected def subj(f: SourceFile): String = s"${f.repo}/${f.path}"
  protected def triple(f: SourceFile, pred: String, obj: String,
                       line: Int, conf: Double = 1.0): Triple =
    Triple(subj(f), pred, obj, conf, f.repo, f.path, f.commit, name, line)

  /** (lineNo 1-based, lineText) iterator over the shared split. */
  protected def lines(ls: Array[String]): Iterator[(Int, String)] =
    ls.iterator.zipWithIndex.map { case (l, i) => (i + 1, l) }
}

object RuleExtractor {
  def split(content: String): Array[String] = {
    // matches String.linesIterator semantics for \n-separated text
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = content.linesIterator
    while (it.hasNext) out += it.next()
    out.toArray
  }
}

/** Index-based scanning primitives shared by the hot extractors.
  *
  * The extract pass is the dominant cost at corpus scale and is
  * memory-bandwidth-bound on allocation (round-1 scaling measurements,
  * BENCH.md): `scala.util.matching.Regex` iteration allocates a Match
  * + boxed iterator step per hit. These helpers scan with character
  * indices and allocate only the emitted substrings. Each scanner
  * mirrors the exact semantics of the regex it replaced (the regex
  * implementations live on as an independent reference in test scope —
  * RegexReferenceSpec asserts equivalence on the fixture corpus and on
  * adversarial edge lines).
  */
private[extract] object Scan {
  @inline def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline def isIdentStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'

  /** Java-regex \s (non-unicode): [ \t\n\x0B\f\r]. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** First index >= from with a non-\s char, or l.length. */
  def skipWs(l: String, from: Int): Int = {
    var i = from
    while (i < l.length && isWs(l.charAt(i))) i += 1
    i
  }

  /** Length of the literal `word` at `at` followed by at least one \s
    * char (the `word\s+` regex shape); -1 if it does not match.
    */
  def wordThenWs(l: String, at: Int, word: String): Int = {
    if (!l.startsWith(word, at)) return -1
    val after = at + word.length
    if (after >= l.length || !isWs(l.charAt(after))) -1 else after + 1
  }

  /** End (exclusive) of the \w* run starting at `from`. */
  def wordRunEnd(l: String, from: Int): Int = {
    var i = from
    while (i < l.length && isWordChar(l.charAt(i))) i += 1
    i
  }

  /** String with trailing \s stripped (the `\s*$` regex tail). */
  def rtrimWs(s: String): String = {
    var e = s.length
    while (e > 0 && isWs(s.charAt(e - 1))) e -= 1
    if (e == s.length) s else s.substring(0, e)
  }
}

/** `imports` — the explain_code-family analog
  * (/root/reference/Demo_Prompts/explain_code/system.md:7-15): which
  * modules a source file pulls in.
  */
object ImportsExtractor extends RuleExtractor {
  import Scan._
  val name = "imports"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"

  // scanner twin of `^\s*import\s+([\w.{}, ]+?)\s*$`
  private def scalaImport(l: String): String = {
    val at = skipWs(l, 0)
    val rest = wordThenWs(l, at, "import")
    if (rest < 0) return null
    val start = skipWs(l, rest)
    val endT = rtrimWs(l.substring(start))
    if (endT.isEmpty) return null
    var i = 0
    while (i < endT.length) {
      val c = endT.charAt(i)
      if (!(isWordChar(c) || c == '.' || c == '{' || c == '}' ||
            c == ',' || c == ' ')) return null
      i += 1
    }
    endT.trim
  }

  // scanner twin of `^\s*import\s+([A-Za-z_][\w.]*)`
  private def pyImport(l: String): String = {
    val at = skipWs(l, 0)
    val rest = wordThenWs(l, at, "import")
    if (rest < 0) return null
    val start = skipWs(l, rest)
    if (start >= l.length || !isIdentStart(l.charAt(start))) return null
    var j = start + 1
    while (j < l.length &&
      (isWordChar(l.charAt(j)) || l.charAt(j) == '.')) j += 1
    l.substring(start, j)
  }

  // scanner twin of `^\s*from\s+([\w.]+)\s+import\b`
  private def pyFrom(l: String): String = {
    val at = skipWs(l, 0)
    val rest = wordThenWs(l, at, "from")
    if (rest < 0) return null
    val start = skipWs(l, rest)
    var j = start
    while (j < l.length &&
      (isWordChar(l.charAt(j)) || l.charAt(j) == '.')) j += 1
    if (j == start) return null
    val afterWs = skipWs(l, j)
    if (afterWs == j) return null // `\s+` needs at least one ws char
    if (!l.startsWith("import", afterWs)) return null
    val b = afterWs + 6
    if (b < l.length && isWordChar(l.charAt(b))) return null // \b
    l.substring(start, j)
  }

  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    var i = 0
    while (i < ls.length) {
      val l = ls(i); val no = i + 1
      if (f.lang == "scala") {
        val m = scalaImport(l)
        if (m != null) out += triple(f, name, m, no)
      } else if (f.lang == "python") {
        val m1 = pyImport(l)
        if (m1 != null) out += triple(f, name, m1, no)
        val m2 = pyFrom(l)
        if (m2 != null) out += triple(f, name, m2, no)
      }
      i += 1
    }
    out.result()
  }
}

/** `defines_fn` — function definitions. */
object DefinesExtractor extends RuleExtractor {
  import Scan._
  val name = "defines_fn"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"

  /** scanner twin of `\bdef\s+([A-Za-z_]\w*)` findAllMatchIn: emits
    * each name and returns scanning after it (non-overlapping).
    */
  private[extract] def scanDefs(l: String)(emit: String => Unit): Unit = {
    var i = l.indexOf("def")
    while (i >= 0) {
      var next = i + 1
      if (i == 0 || !isWordChar(l.charAt(i - 1))) { // \b before
        val afterWs = wordThenWs(l, i, "def")
        if (afterWs >= 0) {
          val start = skipWs(l, afterWs - 1)
          if (start < l.length && isIdentStart(l.charAt(start))) {
            val end = wordRunEnd(l, start + 1)
            emit(l.substring(start, end))
            next = end // resume after the match, like the regex iterator
          }
        }
      }
      i = l.indexOf("def", next)
    }
  }

  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    var i = 0
    while (i < ls.length) {
      val no = i + 1
      scanDefs(ls(i))(nm => out += triple(f, name, nm, no))
      i += 1
    }
    out.result()
  }
}

/** `calls` — call sites: identifier immediately followed by `(`,
  * excluding the definition site itself.
  */
object CallsExtractor extends RuleExtractor {
  import Scan._
  val name = "calls"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"

  /** Prefix-exclusion twin of `\bdef\s+$` on l[0, start). */
  private def defPrefixed(l: String, start: Int): Boolean = {
    var i = start
    while (i > 0 && isWs(l.charAt(i - 1))) i -= 1
    if (i == start) return false // \s+ needs at least one ws char
    i >= 3 && l.startsWith("def", i - 3) &&
      (i == 3 || !isWordChar(l.charAt(i - 4)))
  }

  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    var li = 0
    while (li < ls.length) {
      val l = ls(li); val no = li + 1
      var i = l.indexOf('(')
      while (i >= 0) {
        // maximal \w run ending at '(' …
        var s = i
        while (s > 0 && isWordChar(l.charAt(s - 1))) s -= 1
        // … regex start = leftmost [A-Za-z_] in the run (digits can't
        // start a match)
        var p = s
        while (p < i && !isIdentStart(l.charAt(p))) p += 1
        if (p < i && !defPrefixed(l, p))
          out += triple(f, name, l.substring(p, i), no)
        i = l.indexOf('(', i + 1)
      }
      li += 1
    }
    out.result()
  }
}

/** Shared URL scanner — twin of `https?://[^\s"'()<>]+` findAllMatchIn. */
private[extract] object UrlScan {
  import Scan.isWs
  @inline private def isStop(c: Char): Boolean =
    isWs(c) || c == '"' || c == '\'' || c == '(' || c == ')' ||
      c == '<' || c == '>'

  /** Emits (urlStart, hostStart, hostEnd, urlEnd) index bounds for each
    * URL in `l` — callers slice what they need, nothing else is
    * allocated.
    */
  def scan(l: String)(emit: (Int, Int, Int, Int) => Unit): Unit = {
    var i = l.indexOf("http")
    while (i >= 0) {
      val scheme =
        if (l.startsWith("://", i + 4)) i + 7
        else if (i + 4 < l.length && l.charAt(i + 4) == 's' &&
          l.startsWith("://", i + 5)) i + 8
        else -1
      if (scheme > 0 && scheme < l.length && !isStop(l.charAt(scheme))) {
        var j = scheme
        while (j < l.length && !isStop(l.charAt(j))) j += 1
        var k = scheme
        while (k < j && l.charAt(k) != '/' && l.charAt(k) != ':') k += 1
        emit(i, scheme, k, j)
        i = l.indexOf("http", j)
      } else i = l.indexOf("http", i + 1)
    }
  }
}

/** `mentions_url` — full URLs as written. */
object UrlExtractor extends RuleExtractor {
  val name = "mentions_url"
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    var li = 0
    while (li < ls.length) {
      val l = ls(li); val no = li + 1
      UrlScan.scan(l)((u, _, _, e) =>
        out += triple(f, name, l.substring(u, e), no))
      li += 1
    }
    out.result()
  }
}

/** `mentions_domain` — URL hosts, deduplicated per document
  * (/root/reference/Demo_Prompts/extract_domains/system.md:13-15:
  * dedup, one per line). Surface form is kept verbatim — case/trailing-
  * dot canonicalization is the LINKING stage's job, not extraction's.
  */
object DomainExtractor extends RuleExtractor {
  val name = "mentions_domain"
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val firstLine = scala.collection.mutable.Map[String, Int]()
    var li = 0
    while (li < ls.length) {
      val l = ls(li); val no = li + 1
      UrlScan.scan(l) { (_, hs, he, _) =>
        val host = l.substring(hs, he)
        if (seen.add(host)) firstLine(host) = no
      }
      li += 1
    }
    seen.iterator.map(h => triple(f, name, h, firstLine(h))).toVector
  }
}

/** `references` — "<work> by <author>" mentions, capped at 20 per doc
  * (/root/reference/Demo_Prompts/extract_references/system.md:9-12).
  */
object ReferencesExtractor extends RuleExtractor {
  import Scan._
  val name = "references"
  private val Cap = 20

  @inline private def isAuthorChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '.' || c == ' '

  /** scanner twin of `based on (.+?) by ([A-Z][A-Za-z. ]+?)\s*$`
    * findFirstMatchIn: lazy groups = try every "based on" start, then
    * every " by " split left-to-right, accept the first whose author
    * tail (trailing \s stripped) is [A-Z][A-Za-z. ]+.
    */
  private[extract] def scanRef(l: String): String = {
    var bi = l.indexOf("based on ")
    while (bi >= 0) {
      val restStart = bi + 9
      var byIdx = l.indexOf(" by ", restStart)
      while (byIdx >= 0) {
        if (byIdx > restStart) { // (.+?) needs a non-empty work
          val authorRaw = l.substring(byIdx + 4)
          val a = rtrimWs(authorRaw)
          if (a.length >= 2 && a.charAt(0) >= 'A' && a.charAt(0) <= 'Z') {
            var ok = true
            var i = 1
            while (ok && i < a.length) {
              if (!isAuthorChar(a.charAt(i))) ok = false
              i += 1
            }
            if (ok) return l.substring(restStart, byIdx) + " by " + a
          }
        }
        byIdx = l.indexOf(" by ", byIdx + 1)
      }
      bi = l.indexOf("based on ", bi + 1)
    }
    null
  }

  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    var li = 0
    var found = 0
    while (li < ls.length && found < Cap) {
      val m = scanRef(ls(li))
      if (m != null) {
        out += triple(f, name, m, li + 1)
        found += 1
      }
      li += 1
    }
    out.result()
  }
}

/** `tagged` — lowercase underscore-joined tags
  * (/root/reference/Demo_Prompts/create_tags/system.md:6-20).
  */
object TagsExtractor extends RuleExtractor {
  val name = "tagged"
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for {
      (no, l) <- lines(ls)
      idx = l.indexOf("tags:")
      if idx >= 0
      t <- l.substring(idx + 5).split(",").iterator
      tag = t.trim.toLowerCase.replace(' ', '_')
      if tag.nonEmpty
    } yield triple(f, name, tag, no)).toVector.distinctBy(_.obj)
}

/** `asks` — explicit questions
  * (/root/reference/Prompts/Questions_Documents/system.md:1-12):
  * lines ending in '?', text taken after the last colon if any.
  */
object QuestionsExtractor extends RuleExtractor {
  val name = "asks"
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for {
      (no, raw) <- lines(ls)
      l = raw.trim
      if l.endsWith("?")
      body = l.substring(l.lastIndexOf(':') + 1).stripSuffix("?").trim
      if body.nonEmpty
    } yield triple(f, name, body, no)).toVector
}

/** `flags_compliance` — the Review_Securiity_Document rule table
  * (/root/reference/Prompts/Review_Securiity_Document/system.md:75-90)
  * as (pattern → issue) pairs; one triple per distinct rule hit.
  * In the relational surface the same table is broadcast-joined
  * (SparkEntry `compliance_scan`); here it runs in the single
  * extraction pass so `content` is scanned exactly once at scale.
  */
object ComplianceExtractor extends RuleExtractor {
  val name = "flags_compliance"
  val rules: Seq[(String, String)] = Seq(
    "TLSv1.0" -> "deprecated_tls",
    "SHA-1" -> "weak_hash_sha1",
    "MD5" -> "weak_hash_md5",
    "RSA-1024" -> "short_key_rsa1024"
  )
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    rules.collect {
      case (trigger, issue) if f.content.contains(trigger) =>
        val off = f.content.indexOf(trigger)
        val line = f.content.substring(0, off).count(_ == '\n') + 1
        triple(f, name, issue, line)
    }
}

object ExtractorRegistry {
  /** All active extractors — the analog of the reference's prompt-
    * template registry (/root/reference/app.py:304-310).
    */
  val all: Seq[RuleExtractor] = Seq(
    ImportsExtractor, DefinesExtractor, CallsExtractor, UrlExtractor,
    DomainExtractor, ReferencesExtractor, TagsExtractor,
    QuestionsExtractor, ComplianceExtractor
  )
  def byName(n: String): RuleExtractor = all.find(_.name == n).get

  /** Case-insensitive substring search over the registry — the
    * reference's prompt/model search filters
    * (/root/reference/app.py:378-391,399-436) as a library call.
    */
  def search(q: String): Seq[RuleExtractor] =
    all.filter(_.name.toLowerCase.contains(q.toLowerCase))
}
