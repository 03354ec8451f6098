package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document table (id column + text
  * column). These generalize the reference's prompt families
  * (SURVEY.md §2.4) to arbitrary document DataFrames and add the
  * text-quality operators a large-scale training-data pipeline needs.
  *
  * All pure column expressions (whole-stage codegen, no UDFs); every
  * operator is embarrassingly parallel except the per-doc windows,
  * which partition by document id.
  */
object TextOps {

  private[ops] def words(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count + the reference's words×1.3 LLM-token
    * estimate (/root/reference/app.py:48-49).
    */
  def tokenStats(docs: DataFrame, id: String = "doc_id",
                 text: String = "text"): DataFrame =
    docs.select(col(id),
      size(words(col(text))).as("n_tokens"),
      floor(size(words(col(text))) * 1.3).cast("int").as("est_llm_tokens"))

  /** BPE-ish subword token count: word pieces (with leading
    * apostrophe contractions), digit runs, punctuation runs — the
    * GPT-2 pre-tokenizer family minus its lookaheads, so the pattern
    * stays RE2-safe and SQL-twinnable. A closer LLM-cost proxy than
    * whitespace words for code-heavy text (punctuation tokenizes).
    */
  def bpeTokenCount(docs: DataFrame, id: String = "doc_id",
                    text: String = "text"): DataFrame =
    docs.select(col(id),
      size(regexp_extract_all(col(text),
        lit("'?[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))
        .as("n_bpe_tokens"))

  /** Normalization + content fingerprint (clean_text family,
    * /root/reference/Demo_Prompts/clean_text/system.md: normalize
    * formatting, preserve content — the md5 is the preservation check).
    */
  def fingerprint(docs: DataFrame, id: String = "doc_id",
                  text: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(text))), "\\s+", " ")
    docs.select(col(id), md5(norm).as("fp"),
      length(norm).as("norm_len"))
  }

  /** Quality scoring: token counts, type-token ratio, average word
    * length — the rate_content analog as cheap deterministic metrics.
    */
  def qualityScore(docs: DataFrame, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    val w = words(col(text))
    val nW = size(w)
    val nDistinct = size(array_distinct(w))
    val norm = regexp_replace(lower(trim(col(text))), "\\s+", " ")
    // avg word length = non-space chars / word count
    val nonSpace = length(norm) - (nW - lit(1))
    docs.select(col(id),
      nW.as("n_words"),
      nDistinct.as("n_distinct_words"),
      round(nDistinct.cast("double") / nW, 6).as("ttr"),
      round(nonSpace.cast("double") / nW, 6).as("avg_word_len"))
  }

  /** Language-ID heuristic: marker-token counts → decision ladder.
    * Deliberately simple n-gram-count shape (the real value is the
    * operator plumbing: counts are codegen'd regexp scans, the ladder
    * is a when-chain the optimizer folds).
    */
  def langIdHeuristic(docs: DataFrame, id: String = "doc_id",
                      text: String = "text"): DataFrame = {
    def hits(p: String): Column =
      size(regexp_extract_all(col(text), lit(p), lit(0)))
    val nThe = hits("\\bthe\\b")
    val nA = hits("\\ba\\b")
    docs.select(col(id), nThe.as("n_the"), nA.as("n_a"),
      when(nThe >= 3, "en")
        .when(nA >= 2, "en_weak")
        .otherwise("und").as("predicted_lang"))
  }

  /** First-k-words micro summary
    * (/root/reference/Demo_Prompts/create_micro_summary/system.md).
    */
  def microSummary(docs: DataFrame, k: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame =
    docs.select(col(id),
      concat_ws(" ", slice(words(col(text)), 1, k)).as("summary"))

  /** label_and_rate tier ladder
    * (/root/reference/Demo_Prompts/label_and_rate/system.md:49-57:
    * tier by idea count ≥18 S / 15 A / 12 B / 10 C).
    */
  def tierClassify(docs: DataFrame, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    val ideas = size(array_distinct(words(col(text))))
    docs.select(col(id), ideas.as("n_ideas"),
      when(ideas >= 18, "S").when(ideas >= 15, "A")
        .when(ideas >= 12, "B").when(ideas >= 10, "C")
        .otherwise("D").as("tier"))
  }

  /** (id, word) exploded distinct — the list-extraction primitive
    * (explode + dedup, /root/reference/Demo_Prompts/extract_domains).
    */
  def distinctWords(docs: DataFrame, id: String = "doc_id",
                    text: String = "text"): DataFrame =
    docs.select(col(id),
      explode(array_distinct(words(col(text)))).as("word"))
      .filter(length(col("word")) > 0)

  /** Per-doc top-k most frequent words, deterministic tie-break —
    * the bounded-list cap of extract_references (≤20 items) as a
    * window over counts.
    */
  def topWordsPerDoc(docs: DataFrame, k: Int, id: String = "doc_id",
                     text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = docs
      .select(col(id), explode(words(col(text))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(id, "word").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("n").desc, col("word").asc)
    counted.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Output-repair truncation — faithful port of the reference's
    * extractor post-processing (/root/reference/python.py:276-291):
    *  1. strip;
    *  2. cut at the last sentence end ('.', '?', '!') if that keeps
    *     more than 50% of the text, then strip;
    *  3. if the result still doesn't end on a sentence end, drop the
    *     trailing partial word when the last space keeps > 80%.
    * Pure Scala kernel (runs inside extractors / map functions — no
    * Catalyst needed, SURVEY.md T5).
    */
  def repairTruncate(response0: String): String = {
    val response = response0.strip()
    if (response.isEmpty) return response
    var text = response
    val lastEnd = math.max(text.lastIndexOf('.'),
      math.max(text.lastIndexOf('?'), text.lastIndexOf('!')))
    if (lastEnd > text.length * 0.5)
      text = text.substring(0, lastEnd + 1).strip()
    if (!".!?".contains(text.charAt(text.length - 1))) {
      val lastSpace = text.lastIndexOf(' ')
      if (lastSpace > text.length * 0.8)
        text = text.substring(0, lastSpace).strip()
    }
    text
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, table A1):
    * fraction of words taken by the single most frequent word, and
    * fraction of duplicate word 2-grams — the two cheapest signals
    * that a page is boilerplate/spam. Pure array expressions inside
    * whole-stage codegen: the mode is an O(distinct×n) filter scan
    * per row (docs are bounded; no explode, no shuffle), so the
    * operator is embarrassingly parallel at any corpus size.
    */
  /** Top-word fraction and duplicate-2-gram fraction of a
    * pre-split word array column (shared by [[repetitionScore]] and
    * Curation's inline filter — one definition, one semantics).
    */
  private[ops] def repetitionMetrics(ws: Column): (Column, Column) = {
    val nW = size(ws)
    val topCnt = array_max(transform(array_distinct(ws),
      w => size(filter(ws, x => x === w))))
    val grams = transform(sequence(lit(1), nW - 1),
      i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))
    val dup2 = when(nW >= 2,
      lit(1.0) - size(array_distinct(grams)).cast("double") / (nW - 1))
      .otherwise(0.0)
    (topCnt.cast("double") / nW, dup2)
  }

  /** Each output column LET-BINDS the word array via
    * `transform(array(words), λ)` instead of sharing a projected
    * `__ws` alias: a downstream `.filter($"keep")` (the operator's
    * whole point) would otherwise have predicate pushdown inline
    * `split(text)` into every lambda reference of the alias — an
    * O(words²) re-split per row (measured 10× on the curation chain;
    * see Curation.curate step 2). The binding costs one extra split
    * per output column and is immune to how callers compose it.
    */
  def repetitionScore(docs: DataFrame,
                      maxTopWordFrac: Double = 0.2,
                      maxDup2GramFrac: Double = 0.9,
                      id: String = "doc_id",
                      text: String = "text"): DataFrame = {
    def letWs(f: Column => Column): Column =
      element_at(transform(array(words(col(text))), f), 1)
    docs.select(col(id),
      letWs(ws => size(ws).cast("long")).as("n_words"),
      letWs(ws => round(repetitionMetrics(ws)._1, 6)).as("top_word_frac"),
      letWs(ws => round(repetitionMetrics(ws)._2, 6)).as("dup_2gram_frac"),
      letWs { ws =>
        val (topFrac, dup2) = repetitionMetrics(ws)
        topFrac <= maxTopWordFrac && dup2 <= maxDup2GramFrac
      }.as("keep"))
  }

  /** PII redaction patterns: RE2-safe (no backrefs/lookarounds), so
    * the exact same pattern strings run under Spark's java.util.regex
    * and any RE2-family engine a downstream audit might use.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** PII scrubbing: sequentially redact emails, phone numbers, and
    * IPv4 addresses, counting matches at each stage (each count runs
    * on the text as already scrubbed by the previous stages, so an
    * address inside an email's domain is never double-counted).
    * Pure regexp_replace/regexp_extract_all chain — codegen'd,
    * no shuffle, linear scans per row.
    */
  def piiScrub(docs: DataFrame, id: String = "doc_id",
               text: String = "text"): DataFrame = {
    val (scrubbed, counts) =
      PiiPatterns.foldLeft((col(text), Seq.empty[Column])) {
        case ((t, cs), (pat, repl)) =>
          (regexp_replace(t, lit(pat), lit(repl)),
            cs :+ size(regexp_extract_all(t, lit(pat), lit(0))).cast("long"))
      }
    docs.select(col(id), scrubbed.as("scrubbed"),
      counts.reduce(_ + _).as("n_pii"))
  }

  /** Compliance review: broadcast rule table joined on regex match
    * (/root/reference/Prompts/Review_Securiity_Document — the rule
    * list as data, not code). Broadcast nested-loop join: |rules| regex
    * probes per row, no shuffle of the document side.
    */
  def complianceScan(docs: DataFrame, rules: Seq[(String, String)],
                     id: String = "doc_id",
                     text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ruleDf = rules.toDF("pattern", "issue")
    docs.join(broadcast(ruleDf), expr(s"rlike($text, pattern)"))
      .select(col(id), col("issue"))
  }
}
