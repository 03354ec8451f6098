package graft

/** Independent golden-triple oracle (FIXTURES.md §2).
  *
  * Plain Scala, NO Spark, NO regex — character/indexOf scanning only, so
  * it shares no code path with graft.extract.Extractors. P/R of the
  * engine vs this oracle is the BASELINE.json correctness gate.
  */
object GoldenOracle {

  final case class G(subj: String, pred: String, obj: String)

  private def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  def forFile(f: SourceFile): Set[G] = {
    val subj = s"${f.repo}/${f.path}"
    val out = scala.collection.mutable.LinkedHashSet[G]()
    val ls = f.content.split("\n", -1).toIndexedSeq

    // imports
    if (f.lang == "scala" || f.lang == "python") {
      for (l <- ls) {
        val t = l.trim
        if (t.startsWith("import ")) {
          val rest = t.substring(7).trim
          val mod =
            if (f.lang == "python") rest.takeWhile(c => isIdent(c) || c == '.')
            else rest
          if (mod.nonEmpty) out += G(subj, "imports", mod)
        }
        if (f.lang == "python" && t.startsWith("from ")) {
          val afterFrom = t.substring(5)
          val sp = afterFrom.indexOf(" import")
          if (sp > 0) out += G(subj, "imports", afterFrom.substring(0, sp).trim)
        }
      }
      // defines_fn: "def " preceded by start-or-nonident
      for (l <- ls) {
        var idx = l.indexOf("def ")
        while (idx >= 0) {
          val okBefore = idx == 0 || !isIdent(l.charAt(idx - 1))
          if (okBefore) {
            var j = idx + 4
            while (j < l.length && l.charAt(j) == ' ') j += 1
            val start = j
            while (j < l.length && isIdent(l.charAt(j))) j += 1
            if (j > start && !Character.isDigit(l.charAt(start)))
              out += G(subj, "defines_fn", l.substring(start, j))
          }
          idx = l.indexOf("def ", idx + 1)
        }
      }
      // calls: identifier immediately before '(' not preceded by "def "
      for (l <- ls) {
        var i = l.indexOf('(')
        while (i >= 0) {
          var s = i
          while (s > 0 && isIdent(l.charAt(s - 1))) s -= 1
          if (s < i && !Character.isDigit(l.charAt(s))) {
            val before = l.substring(0, s)
            if (!before.endsWith("def "))
              out += G(subj, "calls", l.substring(s, i))
          }
          i = l.indexOf('(', i + 1)
        }
      }
    }

    // urls + domains (domains deduped by LinkedHashSet already)
    val stop = Set(' ', '\t', '"', '\'', '(', ')', '<', '>')
    for (l <- ls) {
      var i = l.indexOf("http")
      while (i >= 0) {
        val isUrl = l.startsWith("https://", i) || l.startsWith("http://", i)
        if (isUrl) {
          var j = i
          while (j < l.length && !stop.contains(l.charAt(j))) j += 1
          val url = l.substring(i, j)
          out += G(subj, "mentions_url", url)
          val hostStart = url.indexOf("://") + 3
          var k = hostStart
          while (k < url.length && url.charAt(k) != '/' && url.charAt(k) != ':') k += 1
          out += G(subj, "mentions_domain", url.substring(hostStart, k))
          i = l.indexOf("http", j)
        } else i = l.indexOf("http", i + 4)
      }
    }

    // references: "based on W by A"
    for (l <- ls) {
      val bo = l.indexOf("based on ")
      if (bo >= 0) {
        val rest = l.substring(bo + 9)
        val by = rest.indexOf(" by ")
        if (by > 0) {
          val work = rest.substring(0, by)
          val author = rest.substring(by + 4).trim
          if (author.nonEmpty && Character.isUpperCase(author.charAt(0)))
            out += G(subj, "references", s"$work by $author")
        }
      }
    }

    // tags
    for (l <- ls) {
      val ti = l.indexOf("tags:")
      if (ti >= 0)
        for (t <- l.substring(ti + 5).split(',')) {
          val tag = t.trim.toLowerCase.replace(' ', '_')
          if (tag.nonEmpty) out += G(subj, "tagged", tag)
        }
    }

    // asks
    for (l <- ls) {
      val t = l.trim
      if (t.endsWith("?")) {
        val body = t.substring(t.lastIndexOf(':') + 1).dropRight(1).trim
        if (body.nonEmpty) out += G(subj, "asks", body)
      }
    }

    // compliance
    for ((trig, issue) <- Seq("TLSv1.0" -> "deprecated_tls",
        "SHA-1" -> "weak_hash_sha1", "MD5" -> "weak_hash_md5",
        "RSA-1024" -> "short_key_rsa1024"))
      if (f.content.contains(trig)) out += G(subj, "flags_compliance", issue)

    out.toSet
  }

  /** Oracle-side token estimate (independent of Extraction's scanner). */
  def tokens(content: String): Int = {
    val t = content.trim
    if (t.isEmpty) 0 else (t.split("\\s+").length * 1.3).toInt
  }

  def forCorpus(files: Seq[SourceFile], tokenLimit: Int = 16385): Set[G] =
    files.filter(f => tokens(f.content) <= tokenLimit)
      .flatMap(forFile).toSet

  def precisionRecall(got: Set[G], golden: Set[G]): (Double, Double) = {
    val tp = (got intersect golden).size.toDouble
    (if (got.isEmpty) 1.0 else tp / got.size,
     if (golden.isEmpty) 1.0 else tp / golden.size)
  }
}
