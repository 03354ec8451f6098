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

    def urlLine(prefix: String, j: Int): Unit = {
      val dom = pick(rnd, domainPool)
      val variant = pick(rnd, domainVariants(dom))
      sb.append(s"$prefix see https://$variant/guide/$j\n")
    }
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
        sb.append(s"  def handle$j(x: Int): Int = transform$k(x) + parse$k(x)\n")
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
        sb.append(s"def process_$j(data):\n")
        sb.append(s"    return clean_$k(normalize_$k(data))\n")
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
        val dom = pick(rnd, domainPool)
        val variant = pick(rnd, domainVariants(dom))
        sb.append(s"""{"name": "$pkg-$name-$j$k", "homepage": "https://$variant/", "lang": "json"}\n""")
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
              partitions: Int = 0, richness: Int = 1): Dataset[SourceFile] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, p).map(i => row(i, seed, richness))
  }
}
