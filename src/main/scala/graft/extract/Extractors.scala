package graft.extract

import graft.{SourceFile, Triple}
import scala.util.matching.Regex

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

/** `imports` — the explain_code-family analog
  * (/root/reference/Demo_Prompts/explain_code/system.md:7-15): which
  * modules a source file pulls in.
  */
object ImportsExtractor extends RuleExtractor {
  val name = "imports"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"
  private val scalaImport: Regex = """^\s*import\s+([\w.{}, ]+?)\s*$""".r
  private val pyImport: Regex = """^\s*import\s+([A-Za-z_][\w.]*)""".r
  private val pyFrom: Regex = """^\s*from\s+([\w.]+)\s+import\b""".r
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] = {
    val out = Vector.newBuilder[Triple]
    for ((no, l) <- lines(ls)) f.lang match {
      case "scala" =>
        scalaImport.findFirstMatchIn(l).foreach(m =>
          out += triple(f, name, m.group(1).trim, no))
      case "python" =>
        pyImport.findFirstMatchIn(l).foreach(m =>
          out += triple(f, name, m.group(1), no))
        pyFrom.findFirstMatchIn(l).foreach(m =>
          out += triple(f, name, m.group(1), no))
      case _ =>
    }
    out.result()
  }
}

/** `defines_fn` — function definitions. */
object DefinesExtractor extends RuleExtractor {
  val name = "defines_fn"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"
  private val defRe: Regex = """\bdef\s+([A-Za-z_]\w*)""".r
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for ((no, l) <- lines(ls); m <- defRe.findAllMatchIn(l))
      yield triple(f, name, m.group(1), no)).toVector
}

/** `calls` — call sites: identifier immediately followed by `(`,
  * excluding the definition site itself.
  */
object CallsExtractor extends RuleExtractor {
  val name = "calls"
  override def appliesTo(lang: String): Boolean =
    lang == "scala" || lang == "python"
  private val callRe: Regex = """([A-Za-z_]\w*)\(""".r
  private val defPrefix: Regex = """\bdef\s+$""".r
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for {
      (no, l) <- lines(ls)
      m <- callRe.findAllMatchIn(l)
      if defPrefix.findFirstIn(l.substring(0, m.start)).isEmpty
    } yield triple(f, name, m.group(1), no)).toVector
}

/** `mentions_url` — full URLs as written. */
object UrlExtractor extends RuleExtractor {
  val name = "mentions_url"
  private[extract] val urlRe: Regex = """https?://[^\s"'()<>]+""".r
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for ((no, l) <- lines(ls); m <- urlRe.findAllMatchIn(l))
      yield triple(f, name, m.matched, no)).toVector
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
    for ((no, l) <- lines(ls); m <- UrlExtractor.urlRe.findAllMatchIn(l)) {
      val rest = m.matched.substring(m.matched.indexOf("://") + 3)
      val host = rest.takeWhile(c => c != '/' && c != ':')
      if (seen.add(host)) firstLine(host) = no
    }
    seen.iterator.map(h => triple(f, name, h, firstLine(h))).toVector
  }
}

/** `references` — "<work> by <author>" mentions, capped at 20 per doc
  * (/root/reference/Demo_Prompts/extract_references/system.md:9-12).
  */
object ReferencesExtractor extends RuleExtractor {
  val name = "references"
  private val refRe: Regex = """based on (.+?) by ([A-Z][A-Za-z. ]+?)\s*$""".r
  private val Cap = 20
  def extract(f: SourceFile, ls: Array[String]): Seq[Triple] =
    (for ((no, l) <- lines(ls); m <- refRe.findFirstMatchIn(l))
      yield triple(f, name, s"${m.group(1)} by ${m.group(2)}", no))
      .take(Cap).toVector
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
