package graft

import graft.extract.ExtractorRegistry
import graft.ops.TextOps
import graft.store.Snapshots

/** Small reference-parity behaviors: T5 output repair, A3/A4 registry
  * search, O3 single-artifact export (SURVEY.md §2 row ids).
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  test("repairTruncate mirrors /root/reference/python.py:276-291") {
    // ends cleanly: untouched
    assert(TextOps.repairTruncate("A full sentence.") == "A full sentence.")
    // trailing fragment after a sentence end past 50%: cut at the end
    assert(TextOps.repairTruncate("First part is long enough. trailing frag") ==
      "First part is long enough.")
    // no sentence end at all, last space past 80%: drop partial word
    assert(TextOps.repairTruncate("alpha beta gamma delta epsilon zet") ==
      "alpha beta gamma delta epsilon")
    // sentence end too early (<50%): keep, then word-trim rule applies
    val s = "Hi. " + "wordswithoutspaces" * 3
    assert(TextOps.repairTruncate(s) == s, "early period must not truncate")
    // whitespace stripped first
    assert(TextOps.repairTruncate("  done here.  ") == "done here.")
    assert(TextOps.repairTruncate("") == "")
  }

  test("registry search filters case-insensitively") {
    assert(ExtractorRegistry.search("MENTIONS").map(_.name).toSet ==
      Set("mentions_url", "mentions_domain"))
    assert(ExtractorRegistry.search("zzz").isEmpty)
    assert(ExtractorRegistry.search("").size == ExtractorRegistry.all.size)
  }

  test("provider catalogs: dispatch, fetch-failure fallback, prefix filter, search (A1)") {
    import graft.extract.ProviderCatalogs
    // live fetch + prefix whitelist + sort (python.py:74-86): beta-x
    // filtered out, result sorted
    assert(ProviderCatalogs.listModels("alpha") ==
      Seq("alpha-large", "alpha-small"))
    // fetch throws -> hardcoded fallback (python.py:142-173,198-200)
    assert(ProviderCatalogs.listModels("beta") == Seq("beta-base", "beta-pro"))
    // empty whitelist means no filter; still sorted
    assert(ProviderCatalogs.listModels("local") ==
      Seq("scanner-v1", "scanner-v2"))
    // unknown provider answers empty, not an exception
    assert(ProviderCatalogs.listModels("nope").isEmpty)
    // case-insensitive substring search across providers (app.py:378-391)
    assert(ProviderCatalogs.searchModels("ALPHA") ==
      Seq("alpha" -> "alpha-large", "alpha" -> "alpha-small"))
    assert(ProviderCatalogs.searchModels("scanner-v2") ==
      Seq("local" -> "scanner-v2"))
  }

  test("exportSingle produces exactly one data file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    Snapshots.exportSingle(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "id,v" && lines.size == 3)
  }
}
