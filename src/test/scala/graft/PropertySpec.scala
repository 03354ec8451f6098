package graft

import graft.canon.ConnectedComponents
import graft.ops.TextOps
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (SURVEY.md §5.3). Spark-touching properties
  * use the shared session and small sizes; pure-kernel properties run
  * at full ScalaCheck default rates.
  */
object GraftProps extends Properties("graft") {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val smallGraph: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(0, 60)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
  } yield edges.filter(e => e._1 != e._2)

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    if (edges.isEmpty) Map.empty
    else ConnectedComponents.run(edges.toDF("src", "dst"))
      .assignments.as[(Long, Long)].collect().toMap

  property("cc is invariant under edge permutation and orientation") =
    Prop.forAllNoShrink(smallGraph) { edges =>
      val base = cc(edges)
      val rnd = new scala.util.Random(7)
      val flipped = cc(rnd.shuffle(edges).map { case (a, b) => (b, a) })
      base == flipped
    }

  property("canonicalization is idempotent on non-singleton components") =
    Prop.forAllNoShrink(smallGraph) { edges =>
      // cc returns the non-identity delta (member -> component min),
      // which IS a star edge list — re-running cc on it must be a
      // fixpoint (identical delta)
      val assigns = cc(edges)
      cc(assigns.toSeq) == assigns
    }

  property("repairTruncate never grows and preserves clean endings") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val out = TextOps.repairTruncate(s)
      out.length <= s.strip().length &&
        (!s.strip().endsWith(".") || out == s.strip())
    }

  // NOT idempotence: the reference algorithm is single-pass by design
  // (a word-trim can shrink the string enough that the 50% sentence
  // rule newly fires on a second pass — verified on the reference
  // logic itself). The unconditional invariants: output is a prefix
  // of the stripped input and nonempty input stays nonempty.
  property("repairTruncate yields a nonempty prefix of the stripped input") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val stripped = s.strip()
      val out = TextOps.repairTruncate(s)
      out == stripped.take(out.length) &&
        (stripped.isEmpty || out.nonEmpty)
    }

  // pins the edges-stage storage trick (Pipeline drops subj on the
  // extract snapshot and re-derives concat(repo, '/', path) on read —
  // ~15% fewer bytes at 10^12 files): every triple ANY extractor emits
  // must carry subj == repo + "/" + path, for arbitrary repo/path
  // strings including embedded slashes — otherwise drop/re-derive
  // would silently rewrite provenance
  property("subj round-trips through the extract snapshot's drop/re-derive") = {
    val seg = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('/', '.', '-', '_'))).map(_.mkString)
    val file = for {
      repo <- seg
      path <- seg
      lang <- Gen.oneOf("python", "scala", "markdown", "text")
      body <- Gen.oneOf("import os\nx = 1\n", "# title\nSee docs.example.org\n",
        "def f():\n  pass\n", "")
    } yield SourceFile(repo, path, "c0", lang, body)
    Prop.forAllNoShrink(Gen.listOfN(5, file)) { files =>
      graft.extract.Extraction.extract(files.toDS())
        .collect().forall(t => t.subj == s"${t.repo}/${t.path}")
    }
  }

  property("estimateTokens matches split-based count") =
    Prop.forAll(Gen.listOf(Gen.oneOf("word", "a", "  ", "\t", "x y")).map(_.mkString(" "))) { s =>
      val t = s.trim
      val words = if (t.isEmpty) 0 else t.split("\\s+").length
      graft.extract.Extraction.estimateTokens(s) == (words * 1.3).toInt
    }
}
