package graft.extract

import graft.{QuarantineRow, SourceFile, Triple}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Stage 1 — batched mention detection + schema-guided extraction.
  *
  * One `mapPartitions` pass over the files table with a pooled extractor
  * registry per partition (north rule: "mapPartitions-pooled LLM/rule
  * extractors"). The pass emits a SINGLE unified Dataset[Triple]:
  * quarantined documents appear as pred == "__quarantine__" rows so
  * `content` is scanned exactly once — at 10^12-file scale a second scan
  * for the error channel would double the most expensive stage.
  *
  * Reference semantics kept:
  *  - token/size guard BEFORE the expensive extractor
  *    (/root/reference/app.py:51-75 token pre-check;
  *     /root/reference/python.py:493 10 MB PDF cap),
  *  - bounded in-partition retry (/root/reference/python.py:59 tenacity
  *    3 attempts) — the rules are deterministic, but the loop stays so a
  *    real LLM client can drop in without touching the pipeline,
  *  - skip-and-continue error channel (/root/reference/python.py:722-730)
  *    as quarantine rows + accumulator counts instead of a UI list.
  */
object Extraction {

  val QuarantinePred = "__quarantine__"

  /** Token-estimate heuristic of the reference: words × 1.3
    * (/root/reference/app.py:48-49).
    */
  def estimateTokens(content: String): Int = {
    var words = 0; var inWord = false
    var i = 0; val n = content.length
    while (i < n) {
      val ws = Character.isWhitespace(content.charAt(i))
      if (!ws && !inWord) words += 1
      inWord = !ws
      i += 1
    }
    (words * 1.3).toInt
  }

  final case class Config(
      tokenLimit: Int = 16385, // reference default model limit, app.py:56-67
      maxBytes: Int = 10 * 1024 * 1024, // PDF cap analog, python.py:493
      attempts: Int = 3,
      langWhitelist: Set[String] = Set.empty, // empty = all
      // over-limit docs: chunk at line boundaries and extract each
      // chunk (true), or quarantine whole (false — the reference's
      // skip behavior). Chunking preserves the full triple set because
      // every extractor is line-local; per-doc dedup/cap semantics are
      // re-applied after the chunk merge.
      chunkOversize: Boolean = false
  )

  /** The single extraction pass. `errCount`/`okCount` are optional
    * accumulators (run telemetry analog of ProcessingTimer/error list,
    * /root/reference/app.py:103-137,37-40).
    */
  def extract(files: Dataset[SourceFile], cfg: Config = Config(),
              okCount: Option[LongAccumulator] = None,
              errCount: Option[LongAccumulator] = None): Dataset[Triple] = {
    val spark = files.sparkSession
    import spark.implicits._
    val whitelisted =
      if (cfg.langWhitelist.isEmpty) files
      else files.filter($"lang".isin(cfg.langWhitelist.toSeq: _*))

    whitelisted.mapPartitions { it =>
      // pooled per partition: compiled regexes shared across rows
      val registry = ExtractorRegistry.all
      it.flatMap { f =>
        // content is the fat column: estimate tokens exactly once per doc
        lazy val estTokens = estimateTokens(f.content)
        if (f.content.length > cfg.maxBytes)
          Iterator.single(quarantine(f, "oversize_bytes",
            okCount = None, errCount))
        else if (estTokens > cfg.tokenLimit && !cfg.chunkOversize)
          Iterator.single(quarantine(f, "over_token_limit",
            okCount = None, errCount))
        else {
          val splitLines = RuleExtractor.split(f.content)
          val oversize = estTokens > cfg.tokenLimit
          val chunks: Seq[(Int, Array[String])] =
            if (!oversize) Seq((0, splitLines))
            else chunkLines(splitLines, cfg.tokenLimit)
          val out = Vector.newBuilder[Triple]
          var failed: Option[String] = None
          chunks.foreach { case (offset, chunkLs) =>
            val chunkFile =
              if (offset == 0 && chunkLs.length == splitLines.length) f
              else f.copy(content = chunkLs.mkString("\n"))
            registry.iterator.filter(_.appliesTo(f.lang)).foreach { ex =>
              var attempt = 0; var done = false
              while (!done && attempt < cfg.attempts) {
                attempt += 1
                try {
                  val ts = ex.extract(chunkFile, chunkLs)
                  out ++= (if (offset == 0) ts
                           else ts.map(t => t.copy(line = t.line + offset)))
                  done = true
                } catch {
                  case e: Exception if attempt >= cfg.attempts =>
                    failed = Some(s"${ex.name}: ${e.getMessage}")
                    done = true
                  case _: Exception => // retry (tenacity analog)
                }
              }
            }
          }
          failed match {
            case Some(msg) =>
              errCount.foreach(_.add(1))
              Iterator.single(Triple(s"${f.repo}/${f.path}", QuarantinePred,
                "extractor_failure", 0.0, f.repo, f.path, f.commit, msg, 0))
            case None =>
              okCount.foreach(_.add(1))
              val merged =
                if (chunks.length == 1) out.result()
                else normalizeDoc(out.result())
              merged.iterator
          }
        }
      }
    }
  }

  /** Greedy line-boundary chunking under the token estimate. Lines are
    * never split, so a single line over the limit forms its own
    * (over-limit) chunk — acceptable because extraction is regex work,
    * not a context window.
    */
  private[graft] def chunkLines(ls: Array[String],
                                  tokenLimit: Int): Seq[(Int, Array[String])] = {
    val chunks = Vector.newBuilder[(Int, Array[String])]
    var start = 0
    var tokens = 0
    var i = 0
    while (i < ls.length) {
      val t = estimateTokens(ls(i)) max 1
      if (tokens + t > tokenLimit && i > start) {
        chunks += ((start, ls.slice(start, i)))
        start = i
        tokens = 0
      }
      tokens += t
      i += 1
    }
    if (start < ls.length) chunks += ((start, ls.slice(start, ls.length)))
    chunks.result()
  }

  /** Re-apply per-DOC dedup/cap semantics after a chunk merge (each
    * chunk applied them locally): domains/tags/compliance dedupe on
    * obj keeping the first line; references keep the first 20 in line
    * order.
    */
  private[graft] def normalizeDoc(ts: Vector[Triple]): Vector[Triple] = {
    val (norm, rest) = ts.partition(t =>
      t.pred == "mentions_domain" || t.pred == "tagged" ||
        t.pred == "flags_compliance" || t.pred == "references")
    val byPred = norm.groupBy(_.pred)
    val fixed = byPred.toVector.sortBy(_._1).flatMap { case (pred, xs) =>
      val inOrder = xs.sortBy(t => (t.line, t.obj)).distinctBy(_.obj)
      if (pred == "references") inOrder.take(20) else inOrder
    }
    rest ++ fixed
  }

  private def quarantine(f: SourceFile, reason: String,
                         okCount: Option[LongAccumulator],
                         errCount: Option[LongAccumulator]): Triple = {
    errCount.foreach(_.add(1))
    Triple(s"${f.repo}/${f.path}", QuarantinePred, reason, 0.0,
      f.repo, f.path, f.commit, "guard", 0)
  }

  /** Main flow: everything that is a real triple. */
  def triples(raw: Dataset[Triple]): Dataset[Triple] =
    raw.filter(raw("pred") =!= QuarantinePred)

  /** Quarantine flow (dual-output pattern, SURVEY.md O4). */
  def quarantined(raw: Dataset[Triple]): Dataset[QuarantineRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.filter($"pred" === QuarantinePred)
      .select($"repo", $"path", $"commit", lit("").as("lang"),
        $"obj".as("reason"), $"extractor".as("detail"))
      .as[QuarantineRow]
  }

  /** Per-row sha256(content) manifest — the input_hint invariant.
    * Computed with Spark's built-in codegen'd sha2, verified in tests
    * against an independent MessageDigest implementation.
    */
  def manifest(files: Dataset[SourceFile]): DataFrame =
    files.select(files("repo"), files("path"),
      sha2(files("content"), 256).as("sha256"))
}
