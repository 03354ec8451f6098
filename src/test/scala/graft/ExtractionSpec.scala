package graft

import graft.extract.Extraction
import graft.fixtures.FilesGen
import GoldenOracle.G

class ExtractionSpec extends SparkSpec {
  import spark.implicits._

  private val n = 400
  private lazy val corpus = FilesGen.local(n)
  private lazy val ds = FilesGen.dataset(spark, n, partitions = 7)

  private def gotTriples(tokenLimit: Int = 16385): Set[G] =
    Extraction.triples(
      Extraction.extract(ds, Extraction.Config(tokenLimit = tokenLimit)))
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().map { case (s, p, o) => G(s, p, o) }.toSet

  test("generator is deterministic and distributed == local") {
    val fromSpark = ds.collect().sortBy(f => (f.repo, f.path))
    val local = corpus.sortBy(f => (f.repo, f.path))
    assert(fromSpark.toSeq == local)
  }

  test("P/R >= 0.95 vs independent golden oracle (target: 1.0)") {
    val golden = GoldenOracle.forCorpus(corpus)
    val got = gotTriples()
    val (p, r) = GoldenOracle.precisionRecall(got, golden)
    withClue(s"precision=$p recall=$r missing=${(golden -- got).take(5)} extra=${(got -- golden).take(5)}") {
      assert(p >= 0.95 && r >= 0.95)
      assert(p == 1.0 && r == 1.0) // rules are deterministic: demand exact
    }
  }

  test("triple set invariant under partitioning") {
    val a = Extraction.triples(Extraction.extract(ds.repartition(3)))
      .select("subj", "pred", "obj").distinct().count()
    val b = Extraction.triples(Extraction.extract(ds.repartition(13)))
      .select("subj", "pred", "obj").distinct().count()
    assert(a == b && a > 0)
  }

  test("sha256(content) invariant: Spark sha2 == MessageDigest") {
    val sparkSide = Extraction.manifest(ds)
      .as[(String, String, String)].collect()
      .map { case (r, p, h) => (r, p) -> h }.toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    corpus.foreach { f =>
      val h = md.digest(f.content.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(sparkSide((f.repo, f.path)) == h, s"sha mismatch ${f.path}")
    }
  }

  test("token guard quarantines oversize docs and emits no triples for them") {
    val raw = Extraction.extract(ds, Extraction.Config(tokenLimit = 2000))
    val quarantined = Extraction.quarantined(raw)
      .collect().map(q => s"${q.repo}/${q.path}").toSet
    val expected = corpus
      .filter(f => GoldenOracle.tokens(f.content) > 2000)
      .map(f => s"${f.repo}/${f.path}").toSet
    assert(expected.nonEmpty, "fixture should contain oversize docs")
    assert(quarantined == expected)
    val subjWithTriples = Extraction.triples(raw)
      .select("subj").distinct().as[String].collect().toSet
    assert(subjWithTriples.intersect(expected).isEmpty)
    // golden parity also holds under the guard
    val golden = GoldenOracle.forCorpus(corpus, tokenLimit = 2000)
    val (p, r) = GoldenOracle.precisionRecall(gotTriples(2000), golden)
    assert(p == 1.0 && r == 1.0)
  }

  test("chunked extraction of oversize docs recovers the full triple set") {
    val raw = Extraction.extract(ds,
      Extraction.Config(tokenLimit = 2000, chunkOversize = true))
    assert(Extraction.quarantined(raw).isEmpty,
      "chunking must replace quarantining")
    val got = Extraction.triples(raw)
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().map { case (s, p, o) => G(s, p, o) }.toSet
    // golden with NO limit: chunking should lose nothing
    val golden = GoldenOracle.forCorpus(corpus)
    val (p, r) = GoldenOracle.precisionRecall(got, golden)
    withClue(s"p=$p r=$r missing=${(golden -- got).take(3)} extra=${(got -- golden).take(3)}") {
      assert(p == 1.0 && r == 1.0)
    }
  }

  test("chunkLines respects the limit and is a partition of the lines") {
    val ls = Array.tabulate(100)(i => ("w " * (i % 7 + 1)).trim)
    val chunks = Extraction.chunkLines(ls, tokenLimit = 10)
    assert(chunks.flatMap(_._2).toSeq == ls.toSeq)
    assert(chunks.map(_._1).toSeq ==
      chunks.scanLeft(0)((acc, c) => acc + c._2.length).init)
    chunks.foreach { case (_, c) =>
      assert(c.length == 1 ||
        c.map(l => Extraction.estimateTokens(l) max 1).sum <= 10)
    }
  }
}
