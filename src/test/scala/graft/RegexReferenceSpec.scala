package graft

import graft.extract._
import graft.fixtures.FilesGen
import org.scalatest.funsuite.AnyFunSuite

/** The hot extractors are index-based scanners; this spec pins them to
  * the verbatim round-1 regex implementations (RegexReference) on the
  * fixture corpus AND on adversarial edge lines chosen to hit every
  * branch where a scanner could drift from regex semantics
  * (backtracking, word boundaries, lazy groups, non-overlap).
  */
class RegexReferenceSpec extends AnyFunSuite {

  private def scanned(ex: RuleExtractor, lang: String,
                      ls: Array[String]): Vector[(String, String, Int)] = {
    val f = SourceFile("r", "p", "c", lang, ls.mkString("\n"))
    ex.extract(f, ls).map(t => (t.pred, t.obj, t.line)).toVector
  }

  private def assertSame(lang: String, ls: Array[String]): Unit = {
    val ctx = ls.mkString("\\n").take(120)
    assert(scanned(ImportsExtractor, lang, ls) ==
      RegexReference.imports(lang, ls).map(r => (r.pred, r.obj, r.line)), s"imports: $ctx")
    assert(scanned(DefinesExtractor, lang, ls) ==
      RegexReference.defines(ls).map(r => (r.pred, r.obj, r.line)), s"defines: $ctx")
    assert(scanned(CallsExtractor, lang, ls) ==
      RegexReference.calls(ls).map(r => (r.pred, r.obj, r.line)), s"calls: $ctx")
    assert(scanned(UrlExtractor, lang, ls) ==
      RegexReference.urls(ls).map(r => (r.pred, r.obj, r.line)), s"urls: $ctx")
    assert(scanned(DomainExtractor, lang, ls) ==
      RegexReference.domains(ls).map(r => (r.pred, r.obj, r.line)), s"domains: $ctx")
    assert(scanned(ReferencesExtractor, lang, ls) ==
      RegexReference.references(ls).map(r => (r.pred, r.obj, r.line)), s"references: $ctx")
  }

  test("scanners == regex reference on the fixture corpus (both langs, rich sections)") {
    for (f <- FilesGen.local(400, seed = 7L, richness = 4)) {
      val ls = RuleExtractor.split(f.content)
      assertSame(f.lang, ls)
    }
  }

  test("scanners == regex reference on adversarial edge lines") {
    val edges = Array(
      "import foo.bar",
      "  import foo.{a, b}, baz._x  ",
      "import foo.bar // trailing comment kills the scala match",
      "importnot a.b",
      "import ",
      "import import foo",
      "\timport\tx.y\t",
      "from a.b import c",
      "from a.b.import x",
      "from  spaced   import   y",
      "from x import",
      "fromage import brie",
      "def f(x): pass",
      "def def nested",
      "define f(",
      "adef g(x)",
      "def  spaced_name(a)",
      "def 9bad(x)",
      "def _ok(x)",
      "f(g(h(1)))",
      "9x(1) and x9(2)",
      "1(2)",
      "def f(a) calls g(b)",
      "   def   h  (nope) i(yes)",
      "x_(1) _y(2) __(3)",
      "see https://docs.example.org/a/b and http://a.io:8080/z",
      "bad httpx://nope.com and https:// (empty)",
      "https://x.y,continues;here until space then https://q.r",
      "(https://paren.stop.com) 'https://quote.stop.net'",
      "httphttp://tricky.example/x",
      "https://dup.example/1 https://dup.example/2",
      "based on The Art of X by Donald Knuth",
      "based on something by lowercase author",
      "based on A by B",
      "based on W by Y2K Author",
      "this is based on Work One by Alice based on Work Two by Bob",
      "based on Multi by Part by Carol Smith",
      "based on X by D.  ",
      "based on  by Missing Work",
      "tags: a, B c, ,d_e",
      "Q: does this line ask a question?",
      "uses MD5 and SHA-1 and TLSv1.0",
      ""
    )
    for (lang <- Seq("scala", "python", "text")) {
      assertSame(lang, edges)
      // and each line alone, to catch cross-line state leaks
      for (l <- edges) assertSame(lang, Array(l))
    }
  }
}
