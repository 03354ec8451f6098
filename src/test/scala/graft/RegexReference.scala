package graft

import scala.util.matching.Regex

/** The round-1 regex implementations of the hot extractors, kept
  * VERBATIM in test scope as an independent reference: the main-code
  * scanners (graft.extract.Scan twins) must emit byte-identical
  * (pred, obj, line) streams. Together with GoldenOracle (a third,
  * indexOf-style implementation with looser semantics) this keeps the
  * P/R gate honest after the hot path went regex-free.
  */
object RegexReference {

  final case class R(pred: String, obj: String, line: Int)

  private val scalaImport: Regex = """^\s*import\s+([\w.{}, ]+?)\s*$""".r
  private val pyImport: Regex = """^\s*import\s+([A-Za-z_][\w.]*)""".r
  private val pyFrom: Regex = """^\s*from\s+([\w.]+)\s+import\b""".r
  private val defRe: Regex = """\bdef\s+([A-Za-z_]\w*)""".r
  private val callRe: Regex = """([A-Za-z_]\w*)\(""".r
  private val defPrefix: Regex = """\bdef\s+$""".r
  private val urlRe: Regex = """https?://[^\s"'()<>]+""".r
  private val refRe: Regex = """based on (.+?) by ([A-Z][A-Za-z. ]+?)\s*$""".r

  private def lines(ls: Array[String]): Iterator[(Int, String)] =
    ls.iterator.zipWithIndex.map { case (l, i) => (i + 1, l) }

  def imports(lang: String, ls: Array[String]): Vector[R] = {
    val out = Vector.newBuilder[R]
    for ((no, l) <- lines(ls)) lang match {
      case "scala" =>
        scalaImport.findFirstMatchIn(l).foreach(m =>
          out += R("imports", m.group(1).trim, no))
      case "python" =>
        pyImport.findFirstMatchIn(l).foreach(m =>
          out += R("imports", m.group(1), no))
        pyFrom.findFirstMatchIn(l).foreach(m =>
          out += R("imports", m.group(1), no))
      case _ =>
    }
    out.result()
  }

  def defines(ls: Array[String]): Vector[R] =
    (for ((no, l) <- lines(ls); m <- defRe.findAllMatchIn(l))
      yield R("defines_fn", m.group(1), no)).toVector

  def calls(ls: Array[String]): Vector[R] =
    (for {
      (no, l) <- lines(ls)
      m <- callRe.findAllMatchIn(l)
      if defPrefix.findFirstIn(l.substring(0, m.start)).isEmpty
    } yield R("calls", m.group(1), no)).toVector

  def urls(ls: Array[String]): Vector[R] =
    (for ((no, l) <- lines(ls); m <- urlRe.findAllMatchIn(l))
      yield R("mentions_url", m.matched, no)).toVector

  def domains(ls: Array[String]): Vector[R] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val firstLine = scala.collection.mutable.Map[String, Int]()
    for ((no, l) <- lines(ls); m <- urlRe.findAllMatchIn(l)) {
      val rest = m.matched.substring(m.matched.indexOf("://") + 3)
      val host = rest.takeWhile(c => c != '/' && c != ':')
      if (seen.add(host)) firstLine(host) = no
    }
    seen.iterator.map(h => R("mentions_domain", h, firstLine(h))).toVector
  }

  def references(ls: Array[String]): Vector[R] =
    (for ((no, l) <- lines(ls); m <- refRe.findFirstMatchIn(l))
      yield R("references", s"${m.group(1)} by ${m.group(2)}", no))
      .take(20).toVector
}
