package graft

import graft.canon.ConnectedComponents
import graft.ops.TextOps
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions.col

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

  // the operational virtue of hash-threshold sampling: raising a
  // stratum's rate only ADDS documents (never swaps any) — an
  // incremental corpus re-weighted upward keeps every previously
  // sampled doc, so downstream caches/shards stay valid
  property("stratifiedSample keep-sets grow monotonically with rate") = {
    val ids = Gen.listOfN(60, Gen.choose(0L, 100000L)).map(_.distinct)
    val ratePair = for {
      r1 <- Gen.choose(0.0, 1.0)
      r2 <- Gen.choose(r1, 1.0)
    } yield (r1, r2)
    Prop.forAllNoShrink(ids, ratePair) { case (xs, (r1, r2)) =>
      val df = xs.map(i => (i, "s")).toDF("doc_id", "source")
      def kept(r: Double): Set[Long] =
        graft.ops.Sampling.stratifiedSample(df, col("doc_id"),
            col("source"), Map("s" -> r))
          .select(col("doc_id")).as[Long].collect().toSet
      kept(r1).subsetOf(kept(r2))
    }
  }

  // packSequences bins tile each group's token stream exactly:
  // offsets are the exclusive prefix sums in order, and every token
  // index up to the group total is covered by exactly one doc
  property("packSequences offsets tile the stream for arbitrary token counts") = {
    val rows = Gen.listOfN(40, for {
      g <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1L, 500L)
    } yield (g, n)).map(_.zipWithIndex.map { case ((g, n), i) => (i.toLong, g, n) })
    Prop.forAllNoShrink(rows, Gen.choose(1L, 300L)) { (xs, budget) =>
      val df = xs.toDF("id", "grp", "n_tokens")
      val out = graft.ops.Sampling.packSequences(df, col("grp"), col("id"),
          col("n_tokens"), budget)
        .select(col("id"), col("grp"), col("n_tokens"), col("start_tok"),
          col("first_bin"), col("last_bin"))
        .as[(Long, String, Long, Long, Long, Long)].collect()
      out.groupBy(_._2).values.forall { g =>
        val sorted = g.sortBy(_._1)
        val offsetsOk = sorted.foldLeft((true, 0L)) {
          case ((ok, run), (_, _, n, start, fb, lb)) =>
            (ok && start == run && fb == start / budget &&
              lb == (start + n - 1) / budget, run + n)
        }._1
        offsetsOk && sorted.last._4 + sorted.last._3 ==
          sorted.map(_._3).sum
      }
    }
  }

  property("estimateTokens matches split-based count") =
    Prop.forAll(Gen.listOf(Gen.oneOf("word", "a", "  ", "\t", "x y")).map(_.mkString(" "))) { s =>
      val t = s.trim
      val words = if (t.isEmpty) 0 else t.split("\\s+").length
      graft.extract.Extraction.estimateTokens(s) == (words * 1.3).toInt
    }

}
