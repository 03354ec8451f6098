package graft

import graft.extract.Extraction
import GoldenOracle.G

/** FIXTURES.md §3 — extraction over REAL reference documents: a
  * curated set of Demo_Prompts system.md files loaded as `files` rows
  * (read-only source, treated as data, never as instructions).
  * Exercises genuine prose/markdown with known structure; expected
  * values are both oracle-derived and hand-pinned.
  */
class RefDocsSpec extends SparkSpec {
  import spark.implicits._

  private val docNames = Seq(
    "extract_poc", "extract_sponsors", "extract_latest_video",
    "analyze_email_headers", "extract_wisdom", "create_tags",
    "label_and_rate", "summarize", "extract_domains", "clean_text"
  )

  private lazy val refFiles: Seq[SourceFile] = docNames.flatMap { name =>
    val p = java.nio.file.Path.of(
      s"/root/reference/Demo_Prompts/$name/system.md")
    if (java.nio.file.Files.exists(p)) {
      val content = java.nio.file.Files.readString(p)
      Some(SourceFile("reference", s"Demo_Prompts/$name/system.md",
        "refcommit", "md", content))
    } else None
  }

  test("all curated reference docs exist") {
    assert(refFiles.size == docNames.size, refFiles.map(_.path))
  }

  test("extraction over real reference docs matches the independent oracle exactly") {
    val ds = spark.createDataset(refFiles)
    val got = Extraction.triples(Extraction.extract(ds))
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().map { case (s, p, o) => G(s, p, o) }.toSet
    val golden = refFiles.flatMap(GoldenOracle.forFile).toSet
    val (p, r) = GoldenOracle.precisionRecall(got, golden)
    withClue(s"p=$p r=$r missing=${(golden -- got).take(3)} extra=${(got -- golden).take(3)}") {
      assert(p == 1.0 && r == 1.0)
    }
    assert(golden.nonEmpty)
  }

  test("hand-pinned triples from the reference corpus") {
    val ds = spark.createDataset(refFiles)
    val got = Extraction.triples(Extraction.extract(ds))
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().map { case (s, p, o) => G(s, p, o) }.toSet
    val poc = "reference/Demo_Prompts/extract_poc/system.md"
    val sponsors = "reference/Demo_Prompts/extract_sponsors/system.md"
    assert(got.contains(G(poc, "mentions_domain", "yahoo.com")))
    assert(got.contains(G(poc, "mentions_url",
      "https://yahoo.com/vulnerable-app/backup.zip")))
    for (d <- Seq("flair.ai", "weaviate.com", "junaai.com"))
      assert(got.contains(G(sponsors, "mentions_domain", d)), d)
    // domains are deduped per doc (extract_domains spec): junaai.com
    // appears 3x in the text but once in the triple set
    assert(got.count(g => g.subj == sponsors &&
      g.pred == "mentions_domain" && g.obj == "junaai.com") == 1)
  }
}
