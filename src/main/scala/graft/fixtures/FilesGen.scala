package graft.fixtures

import graft.SourceFile
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic `files` table (FIXTURES.md §1).
  *
  * Every row is a pure function of (seed, index): the Spark generator
  * (`dataset`) and any plain-Scala consumer (the golden-triple oracle in
  * tests) observe byte-identical content, so P/R comparisons are exact
  * and re-running the generator at any parallelism yields the same table.
  *
  * Properties exercised on purpose:
  *  - Zipf-skewed `repo` (a few hub repos) → skew paths in linking/CC.
  *  - 5 languages generalizing the reference's extension dispatch
  *    (/root/reference/python.py:465-476).
  *  - Planted extractables: imports, function defs, calls, URLs/domains,
  *    "X by Y" references, tags lines, questions, compliance triggers
  *    (/root/reference/Prompts/Review_Securiity_Document/system.md rule
  *    list) — each with NEAR-DUPLICATE surface variants (case, trailing
  *    dot/underscore vs space) so entity linking has real work to do.
  */
object FilesGen {

  val Langs: Vector[String] = Vector("scala", "python", "md", "txt", "json")

  // small pools; variants of the same logical entity differ in case /
  // trailing punctuation — the linking stage must re-unite them.
  private val importPoolScala = Vector(
    "scala.collection.mutable.Map",
    "scala.concurrent.Future",
    "com.example.util.Helper",
    "com.example.net.HttpClient",
    "org.acme.json.Parser"
  )
  private val importPoolPython = Vector(
    "os", "json", "collections", "itertools", "hashlib"
  )
  private val domainPool = Vector(
    "docs.example.org", "api.acme.io", "wiki.sample.net", "repo.code.dev"
  )
  // variants split in two difficulty tiers: case/trailing-dot variants
  // normalize away (exact-norm linking); "www."-prefixed ones survive
  // normalization and require fuzzy (MinHash-LSH) linking.
  private val domainVariants: Map[String, Vector[String]] = Map(
    "docs.example.org" -> Vector("docs.example.org", "Docs.Example.Org",
      "docs.example.org.", "www.docs.example.org"),
    "api.acme.io" -> Vector("api.acme.io", "API.ACME.IO", "www.api.acme.io"),
    "wiki.sample.net" -> Vector("wiki.sample.net", "wiki.Sample.net."),
    "repo.code.dev" -> Vector("repo.code.dev")
  )
  private val referencePool = Vector(
    ("FastParse", "Li Haoyi"),
    ("Resilient Distributed Datasets", "Matei Zaharia"),
    ("The Pragmatic Programmer", "Andrew Hunt"),
    ("Designing Data-Intensive Applications", "Martin Kleppmann")
  )
  private val tagPool = Vector(
    "spark", "etl", "parser", "security", "streaming", "graph", "data quality"
  )
  private val compliancePool = Vector(
    ("TLSv1.0", "deprecated_tls"),
    ("SHA-1", "weak_hash_sha1"),
    ("MD5", "weak_hash_md5"),
    ("RSA-1024", "short_key_rsa1024")
  )
  private val questionPool = Vector(
    "why does the cache fail under load",
    "what happens when the commit is empty",
    "how do we retry a poisoned batch",
    "when should the snapshot be compacted"
  )
  private val proseWords = Vector(
    "the", "pipeline", "reads", "every", "file", "and", "emits", "rows",
    "with", "stable", "hashes", "for", "each", "commit", "under", "load"
  )

  // ---- long-tail entity population -------------------------------------
  //
  // The fixed pools above are the HEAD: a handful of hot entities that
  // exercise skew and pin the linking spec's unite/separate assertions.
  // Real corpora also carry a long tail of entities whose count grows
  // with corpus size — without it, linking and connected components are
  // fixed-cost toys no matter how many files the bench generates. Each
  // long-tail entity is a logical id in [0, LongTailSpace) whose surface
  // words are letter-only syllable encodings of splitmix64 mixes of the
  // id: distinct ids share no full word (word space ≈ 421k per slot), so
  // the worst-case 3-gram Jaccard between DIFFERENT logical domains
  // (same first word, same tld) is ≈ 0.36 < the 0.5 linking threshold —
  // the tail adds linking WORK, never linking chains.
  private[fixtures] val LongTailSpace = 1 << 18
  private val LongTailProb = 0.7 // per mention: tail vs fixed-pool head
  private val tldPool = Vector("org", "net", "dev", "xyz")

  private def mix64(x: Long): Long = { // splitmix64 finalizer
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val cons = "bcdfgklmnprstvz"
  private val vows = "aeiou"

  /** Letter-only 6-char pseudo-word (3 consonant-vowel syllables) of a
    * 64-bit value — deterministic, digit-free (digit-heavy strings
    * shingle-collide across unrelated entities).
    */
  private[fixtures] def syllWord(x: Long): String = {
    var h = mix64(x)
    val sb = new StringBuilder(6)
    var i = 0
    while (i < 3) {
      sb.append(cons(java.lang.Long.remainderUnsigned(h, cons.length.toLong).toInt))
      h = java.lang.Long.divideUnsigned(h, cons.length.toLong)
      sb.append(vows(java.lang.Long.remainderUnsigned(h, vows.length.toLong).toInt))
      h = java.lang.Long.divideUnsigned(h, vows.length.toLong)
      i += 1
    }
    sb.toString
  }

  /** Canonical long-tail host for a logical id: `w1-w2.tld`. The tld is
    * a function of the id (same words ⇒ same tld), so two hosts that
    * differ only in tld never exist and cannot fuzzy-link.
    */
  private[fixtures] def longTailHost(id: Long): String = {
    val w1 = syllWord(mix64(id * 4 + 1))
    val w2 = syllWord(mix64(id * 4 + 2))
    s"$w1-$w2.${tldPool((mix64(id * 4 + 3) & 3L).toInt)}"
  }

  /** A surface variant of the long-tail host: canonical (exact tier),
    * cased / trailing-dot (normalize away), or www.-prefixed (survives
    * normalization — 3-gram Jaccard vs canonical ≈ 0.79, fuzzy tier).
    */
  private def longTailDomainVariant(rnd: scala.util.Random): String = {
    val base = longTailHost(rnd.nextInt(LongTailSpace).toLong)
    rnd.nextDouble() match {
      case d if d < 0.45 => base
      case d if d < 0.65 =>
        base.split('-') match { case Array(a, b) => s"${a.capitalize}-${b.capitalize}" }
      case d if d < 0.80 => base + "."
      case _             => "www." + base
    }
  }

  /** Long-tail function-name suffix (defines/calls predicates link by
    * exact norm only — no shingles — so entity growth here scales the
    * groupBy side of linking and the node table, not the LSH join).
    */
  private def longTailFn(rnd: scala.util.Random): String =
    syllWord(mix64(rnd.nextInt(LongTailSpace).toLong * 2 + 1))

  /** Zipf over k items: P(i) ∝ 1/(i+1). */
  private def zipf(rnd: scala.util.Random, k: Int): Int = {
    val norm = (1 to k).map(1.0 / _).sum
    var u = rnd.nextDouble() * norm
    var i = 0
    while (i < k - 1 && u > 1.0 / (i + 1)) { u -= 1.0 / (i + 1); i += 1 }
    i
  }

  private def pick[T](rnd: scala.util.Random, v: Vector[T]): T = v(rnd.nextInt(v.size))

  /** Pure row function: the whole fixture contract lives here.
    * `richness` = number of generated sections per file (1 for unit
    * fixtures; higher for benchmark corpora so extraction is
    * CPU-bound rather than scheduling-bound — realistic source files
    * are KBs, not hundreds of bytes). Must stay <= 20 so the
    * references per-doc cap is never reached (the golden oracle does
    * not model the cap).
    */
  def row(i: Long, seed: Long, richness: Int = 1): SourceFile = {
    require(richness >= 1 && richness <= 20)
    val rnd = new scala.util.Random(seed * 1000003L + i)
    val repoIdx = zipf(rnd, 20)
    val repo = f"repo$repoIdx%03d"
    val lang = Langs(
      // weighted: scala .3, python .3, md .2, txt .1, json .1
      rnd.nextDouble() match {
        case d if d < 0.3 => 0
        case d if d < 0.6 => 1
        case d if d < 0.8 => 2
        case d if d < 0.9 => 3
        case _            => 4
      }
    )
    val ext = lang match {
      case "scala" => "scala"; case "python" => "py"; case "md" => "md"
      case "txt" => "txt"; case "json" => "json"
    }
    val pkg = s"pkg${rnd.nextInt(8)}"
    val name = s"file$i"
    val path = s"src/$pkg/$name.$ext"
    val jk = IndexedSeq.fill(40)(rnd.nextInt(5))

    val sb = new StringBuilder
    def maybe(p: Double)(body: => Unit): Unit = if (rnd.nextDouble() < p) body

    def domainMention(): String =
      if (rnd.nextDouble() < LongTailProb) longTailDomainVariant(rnd)
      else pick(rnd, domainVariants(pick(rnd, domainPool)))
    def urlLine(prefix: String, j: Int): Unit =
      sb.append(s"$prefix see https://${domainMention()}/guide/$j\n")
    def tagsLine(prefix: String): Unit = {
      val n = 2 + rnd.nextInt(3)
      val tags = (0 until n).map(_ => pick(rnd, tagPool)).distinct
      sb.append(s"$prefix tags: ${tags.mkString(", ")}\n")
    }
    def refLine(prefix: String): Unit = {
      val (work, author) = pick(rnd, referencePool)
      // surface variants: lowercase (exact-norm tier) and dropped
      // leading article (fuzzy/LSH tier)
      val w0 = if (rnd.nextBoolean()) work else work.toLowerCase
      val w = if (w0.toLowerCase.startsWith("the ") && rnd.nextBoolean())
        w0.substring(4) else w0
      sb.append(s"$prefix based on $w by $author\n")
    }
    def questionLine(prefix: String): Unit =
      sb.append(s"$prefix TODO: ${pick(rnd, questionPool)}?\n")
    def complianceLine(prefix: String, asCode: Boolean): Unit = {
      val (trigger, _) = pick(rnd, compliancePool)
      if (asCode) sb.append(s"""  val cipher = "$trigger"\n""")
      else sb.append(s"$prefix uses $trigger for signing\n")
    }
    def prose(nWords: Int): String =
      (0 until nWords).map(_ => pick(rnd, proseWords)).mkString(" ")

    for (section <- 0 until richness) {
      val j = jk(section * 2)
      val k = jk(section * 2 + 1)
      lang match {
      case "scala" =>
        sb.append(s"package $pkg\n")
        val nImp = 1 + rnd.nextInt(3)
        (0 until nImp).foreach(_ => sb.append(s"import ${pick(rnd, importPoolScala)}\n"))
        maybe(0.5)(tagsLine("//"))
        maybe(0.4)(questionLine("//"))
        maybe(0.5)(urlLine("//", j))
        maybe(0.3)(refLine("//"))
        sb.append(s"object Service$j {\n")
        val (hn, tn, pn) =
          if (rnd.nextDouble() < LongTailProb)
            (s"handle_${longTailFn(rnd)}", s"transform_${longTailFn(rnd)}",
              s"parse_${longTailFn(rnd)}")
          else (s"handle$j", s"transform$k", s"parse$k")
        sb.append(s"  def $hn(x: Int): Int = $tn(x) + $pn(x)\n")
        maybe(0.3)(sb.append(s"  def render$k(s: String): String = s.trim\n"))
        maybe(0.25)(complianceLine("//", asCode = true))
        sb.append("}\n")
      case "python" =>
        val nImp = 1 + rnd.nextInt(3)
        (0 until nImp).foreach(_ => sb.append(s"import ${pick(rnd, importPoolPython)}\n"))
        maybe(0.4)(sb.append(s"from collections import defaultdict\n"))
        maybe(0.5)(tagsLine("#"))
        maybe(0.4)(questionLine("#"))
        maybe(0.5)(urlLine("#", j))
        maybe(0.3)(refLine("#"))
        val (dn, cn, nn) =
          if (rnd.nextDouble() < LongTailProb)
            (s"process_${longTailFn(rnd)}", s"clean_${longTailFn(rnd)}",
              s"normalize_${longTailFn(rnd)}")
          else (s"process_$j", s"clean_$k", s"normalize_$k")
        sb.append(s"def $dn(data):\n")
        sb.append(s"    return $cn($nn(data))\n")
        maybe(0.25)(complianceLine("#", asCode = false))
      case "md" =>
        sb.append(s"# Guide $j\n\n")
        sb.append(prose(12)).append(".\n\n")
        maybe(0.7)(urlLine("-", j))
        maybe(0.6)(refLine("-"))
        maybe(0.6)(questionLine("-"))
        maybe(0.5)(tagsLine(""))
        maybe(0.3)(complianceLine("-", asCode = false))
        sb.append("\n").append(prose(10)).append(".\n")
      case "txt" =>
        sb.append(prose(15)).append(".\n")
        maybe(0.5)(urlLine("", j))
        maybe(0.4)(questionLine(""))
        maybe(0.3)(refLine(""))
        maybe(0.2)(complianceLine("", asCode = false))
      case "json" =>
        sb.append(s"""{"name": "$pkg-$name-$j$k", "homepage": "https://${domainMention()}/", "lang": "json"}\n""")
      }
    }
    // a small fraction of oversize docs to exercise the token guard
    // (reference: check_token_limit, /root/reference/app.py:51-75)
    if (rnd.nextDouble() < 0.01) sb.append(prose(3000))

    val commit = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s"$repo/$path#$seed".getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
    }
    SourceFile(repo, path, commit, lang, sb.toString)
  }

  /** Plain-Scala corpus (tests, golden oracle). */
  def local(n: Int, seed: Long = 42L, richness: Int = 1): IndexedSeq[SourceFile] =
    (0L until n.toLong).map(row(_, seed, richness))

  /** Distributed corpus: rows generated inside tasks, never on the
    * driver — at bench scale (and at 10^12-row scale in spirit) the
    * driver only ships (seed, range) bounds.
    */
  def dataset(spark: SparkSession, n: Long, seed: Long = 42L,
              partitions: Int = 0, richness: Int = 1,
              start: Long = 0L): Dataset[SourceFile] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    // `n` is ALWAYS the row count; `start` offsets into the same
    // deterministic universe (row i is a pure function of (i, seed)),
    // so dataset(k) ∪ dataset(n-k, start=k) == dataset(n) exactly —
    // the incremental-ingest bench's delta corpus
    spark.range(start, start + n, 1L, p).map(i => row(i, seed, richness))
  }
}
