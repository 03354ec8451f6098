package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash groupBy), n-gram Jaccard (relational, oracle-checkable),
  * SimHash (bit-sign aggregate + banded candidate join), and MinHash
  * banding (hand-rolled min-xxhash64 column expressions — no fitted
  * model). Embedding-cosine near-dup lives in Similarity.
  *
  * Scale notes:
  *  - exact dedup is one shuffle on the 16-byte digest, never on text;
  *  - n-gram Jaccard shuffles (shingle → doc list) pairs; the shingle
  *    join is the textbook blocking step — hot shingles (shared by
  *    >maxDocsPerShingle docs) are dropped as stop-shingles, which
  *    bounds the worst-case pair blowup at web scale;
  *  - SimHash candidates come from equality joins on 4×16-bit bands
  *    (any pair within Hamming distance 3 shares ≥1 exact band), so
  *    no O(n²) compare ever happens.
  */
object Dedup {

  /** Exact dedup: survivor = min id per md5(text). */
  def exactSurvivors(docs: DataFrame, id: String = "doc_id",
                     text: String = "text"): DataFrame =
    docs.select(col(id), md5(col(text)).as("fp"))
      .groupBy("fp").agg(min(col(id)).as(id))
      .select(id)

  /** Exact duplicate groups with sizes (diagnostic view). */
  def exactGroups(docs: DataFrame, id: String = "doc_id",
                  text: String = "text"): DataFrame =
    docs.select(col(id), md5(col(text)).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n"), min(col(id)).as("keep"))
      .filter(col("n") > 1)

  /** Word n-gram shingles: (id, shingle), distinct per doc. The word
    * split runs ONCE per row in its own projection — referencing
    * split(...) inside the transform lambda would re-split the text
    * per shingle index (O(words²) per doc; measured 1.5× on the whole
    * shingle-join queries at sf0.1).
    */
  def wordShingles(docs: DataFrame, n: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    docs
      .select(col(id), split(trim(col(text)), "\\s+").as("__ws"))
      .select(col(id), explode(array_distinct(expr(
        s"""transform(
           |  sequence(1, greatest(size(__ws) - ${n - 1}, 1)),
           |  i -> array_join(slice(__ws, i, $n), ' '))""".stripMargin
      ))).as("shingle"))
  }

  /** Near-duplicate pairs by n-gram Jaccard ≥ minJ.
    * Fully relational: shingle blocking join → per-pair intersection
    * count → Jaccard from per-doc shingle counts.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJ: Double,
                        maxDocsPerShingle: Long = 1000L,
                        id: String = "doc_id",
                        text: String = "text"): DataFrame = {
    val sh = wordShingles(docs, n, id, text).persist()
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    // stop-shingle filter: a shingle in >maxDocsPerShingle docs is
    // discriminating nothing and would explode the pair join
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocsPerShingle).select("shingle")
    val blocked = sh.join(rare, Seq("shingle"))
    val pairs = blocked.as("a")
      .join(blocked.as("b"), Seq("shingle"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed(id, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(id, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= minJ)
      .select("id_a", "id_b", "jaccard")
  }

  /** Benchmark decontamination: corpus docs sharing at least
    * `minOverlap` distinct word n-grams with ANY benchmark doc, with
    * the overlap count — the standard pre-training hygiene pass that
    * keeps eval data out of the training set.
    *
    * Scale shape: benchmark/eval sets are SMALL by construction
    * (thousands of docs, not billions), so the distinct benchmark
    * n-gram set is broadcast and the corpus side is a map-side hash
    * semi-join — the 100 TB corpus is scanned once, never shuffled on
    * text; the only shuffle is the per-doc overlap count over the
    * matched (id, shingle) rows (partial-aggregated map-side). For a
    * benchmark too big to broadcast, this operator is the wrong tool —
    * that's corpus-vs-corpus near-dedup, i.e. [[ngramJaccardPairs]].
    */
  def contaminated(docs: DataFrame, bench: DataFrame, n: Int,
                   minOverlap: Long = 1L, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    val benchGrams = wordShingles(bench, n, id, text)
      .select(col("shingle")).distinct()
    wordShingles(docs, n, id, text)
      .join(broadcast(benchGrams), Seq("shingle"))
      .groupBy(col(id)).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Corpus-level duplicated-text fraction (the CCNet/RefinedWeb
    * passage-dedup signal): split each doc into NON-overlapping
    * `k`-word chunks (partial tail dropped), compute each chunk's
    * document frequency across the whole corpus, and report per doc
    * the fraction of its chunks that also appear in some OTHER doc.
    * Docs shorter than `k` words emit no chunks and are absent.
    *
    * Scale shape: chunks are immediately replaced by their 64-bit
    * md5-derived hashes ([[md5NumberLower]]), so the two shuffles
    * (df count on the chunk key; join back to docs) move only
    * (long, long) pairs — never text. Chunk count is n_words/k per
    * doc (not n_words like shingles), the df aggregate is map-side
    * combined, and the per-doc rollup re-shuffles on the doc id.
    * A 2^-64 hash collision makes two distinct chunks compare equal
    * — the standard trade at web scale (same as exact-dedup md5).
    */
  def dupChunkFrac(docs: DataFrame, k: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    require(k >= 1, s"chunk size must be >= 1, got $k")
    val chunks = docs
      .select(col(id), split(trim(col(text)), "\\s+").as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col(id), explode(expr(
        s"""transform(
           |  sequence(1, size(__ws) div $k),
           |  j -> array_join(slice(__ws, (j - 1) * $k + 1, $k), ' '))"""
          .stripMargin)).as("chunk"))
      .select(col(id), md5NumberLower(md5(col("chunk"))).as("h"))
    // a doc repeating its own chunk counts each occurrence, but only
    // cross-doc repetition marks a chunk duplicated (distinct doc df)
    val perDoc = chunks.groupBy(col(id), col("h"))
      .agg(count(lit(1)).as("cnt"))
    // df via a WINDOW over perDoc instead of a groupBy+join-back: the
    // aggregate route re-exchanged perDoc by h AND shuffled the df
    // table into the join; the window takes ONE exchange on h with a
    // spillable buffer (the Linking census shape — and unlike the
    // rejected ngram restructure there is no pair expansion here, so
    // nothing quadratic rides the bucket). QueryBench min 1.05→0.56 s
    // at sf0.1, brute-force spec + oracle unchanged.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    perDoc.withColumn("df", count(lit(1)).over(w))
      .groupBy(col(id)).agg(
        sum(col("cnt")).as("n_chunks"),
        sum(when(col("df") > 1, col("cnt")).otherwise(0L)).as("n_dup_chunks"))
      .select(col(id), col("n_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6)
          .as("dup_chunk_frac"))
  }

  /** 64-bit word hash both engines can compute: the little-endian
    * uint64 of md5 bytes 8..15 — exactly DuckDB's
    * `md5_number_lower(word)`, reassembled here from the hex digest by
    * reversing the byte pairs and converting with a SIGNED target base
    * (`conv(_, 16, -10)`) so the full 64-bit pattern survives the cast
    * to long. This (rather than the cheaper xxhash64) is what makes
    * SimHash oracle-checkable cross-engine; the md5 is hoisted into
    * its own projection so it runs once per word, not once per byte.
    */
  private def md5NumberLower(md5Hex: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    conv(concat((7 to 0 by -1).map(j =>
      substring(md5Hex, 17 + 2 * j, 2)): _*), 16, -10).cast("long")

  /** 64-bit SimHash of the word multiset, as 64 sign-sum aggregates
    * over md5-derived word-hash bits — pure column expressions,
    * map-side combined, no UDF, reproducible in DuckDB.
    *
    * The md5 chain (hex digest + 8 substring/concat + signed conv) is
    * the expensive part, so it runs ONCE PER DISTINCT WORD: occurrences
    * are pre-aggregated to (doc, word, cnt) with map-side combine, the
    * distinct vocabulary is hashed separately and joined back (a small
    * table — AQE broadcasts it here; at corpus scale it's a plain
    * shuffle join on the word key, never on the documents), and the 64
    * bit-sums are weighted by cnt. Identical output to the
    * per-occurrence formulation (Σ_occurrences ±1 == Σ_words cnt·±1);
    * 17.4s → ~3s at sf0.1 (the round-3 regression this reverses).
    */
  def simhash(docs: DataFrame, id: String = "doc_id",
              text: String = "text"): DataFrame = {
    val wordCnt = docs.select(col(id),
      explode(split(trim(col(text)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(id), col("word")).agg(count(lit(1)).as("cnt"))
    val vocab = wordCnt.select("word").distinct()
      .withColumn("__md5", md5(col("word")))
      .withColumn("h", md5NumberLower(col("__md5")))
      .drop("__md5")
    val wordsDf = wordCnt.join(vocab, Seq("word"))
    // branch-free ±cnt (bit*2-1 ∈ {-1, +1}): the 64 aggregates compile
    // to straight-line arithmetic — a CASE WHEN per bit doubled the
    // janino compile time of this (the widest codegen'd aggregate in
    // the engine, paid once per JVM)
    val bitSums = (0 until 64).map { i =>
      sum(expr(s"(((h >> $i) & 1) * 2 - 1) * cnt")).as(s"b$i")
    }
    val agg = wordsDf.groupBy(col(id)).agg(bitSums.head, bitSums.tail: _*)
    val simhashCol = (0 until 64).map { i =>
      when(col(s"b$i") > 0, expr(s"cast(1 as long) << $i")).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col(id), simhashCol.as("simhash"))
  }

  /** SimHash near-dup candidate pairs within Hamming distance
    * `maxHamming` (≤ 3 guaranteed complete with 4 bands by pigeonhole).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding is complete only for hamming<=3")
    val sh = simhash(docs, id, text).persist()
    val banded = sh.select(col(id), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          expr(s"(simhash >> ${b * 16}) & 65535").as("key"))): _*)).as("bk"))
      .select(col(id), col("simhash"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"), Seq("band", "key"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** MinHash band keys as pure column expressions: key_i = min over
    * the doc's distinct shingles of xxhash64(seed+i, shingle) — the
    * classic r=1, OR-b banding (the same table shape MLlib's
    * MinHashLSH builds) with no fit step, no TF feature hashing, and
    * map-side-combined min aggregates. Candidates = id pairs sharing
    * at least one (band, key); a pair at Jaccard J collides per band
    * with probability J, so OR-b misses a J≥0.5 pair with probability
    * ≤ (1−J)^b (≈0.4% at b=8) while random text pairs (shingle
    * Jaccard ≈ 0) almost never collide.
    */
  /** (id, key) MinHash band-key table — the blocking artifact both
    * the self-join candidates and the cross-corpus decontamination
    * join bucket on. No separate band column (round 8): each band's
    * min-hash uses its own seed (`seed + i`), so keys are
    * band-distinct by construction and the blocking joins key on ONE
    * long instead of (band:int, key:long). A cross-band 64-bit
    * coincidence merges two unrelated buckets — it can only ADD a
    * candidate pair, which the exact-Jaccard re-score then judges,
    * the same accepted collision regime as exact dedup's md5.
    */
  private[graft] def bandKeys(docs: DataFrame, n: Int, numBands: Int,
                              seed: Long, id: String,
                              text: String): DataFrame = {
    val sh = wordShingles(docs, n, id, text)
    val aggs = (0 until numBands).map(i =>
      min(xxhash64(lit(seed + i), col("shingle"))).as(s"k$i"))
    val keys = sh.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
    keys.select(col(id), explode(array((0 until numBands).map(i =>
        col(s"k$i")): _*)).as("key"))
  }

  private[graft] def minhashBandCandidates(docs: DataFrame, n: Int = 3,
                                           numBands: Int = 8,
                                           seed: Long = 42L,
                                           id: String = "doc_id",
                                           text: String = "text"): DataFrame = {
    val banded = bandKeys(docs, n, numBands, seed, id, text)
    banded.as("a").join(banded.as("b"), Seq("key"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
  }

  /** NEAR-DUP-level benchmark decontamination: corpus docs whose
    * n-gram Jaccard vs ANY eval/benchmark doc reaches `minJ` — the
    * fuzzy upgrade of [[contaminated]] (which counts shared n-grams:
    * an eval answer paraphrased with a few word swaps sails past an
    * overlap threshold scaled for verbatim leakage, but not past a
    * Jaccard one). Returns per contaminated doc its match count and
    * max Jaccard.
    *
    * Scale shape (bench small by construction, like [[contaminated]]):
    * MinHash band keys on both sides, the BENCH side broadcast into
    * the blocking join, so the corpus is scanned, never shuffled;
    * candidates (≤ |matching docs| × |bench|) broadcast back against a
    * candidate-pruned shingle-set build (only matched docs' shingles
    * ever aggregate), and the exact-Jaccard re-score keeps precision
    * 1.0. Recall is banding recall (1-(1-J)^bands per pair) — the
    * candidate-completeness property OpsSpec pins empirically for the
    * self-join path applies unchanged (a cross pair IS a corpus pair).
    */
  def fuzzyContaminated(docs: DataFrame, bench: DataFrame, n: Int = 3,
                        minJ: Double = 0.5, numBands: Int = 8,
                        seed: Long = 42L, id: String = "doc_id",
                        text: String = "text"): DataFrame = {
    val cand = bandKeys(docs, n, numBands, seed, id, text)
      .join(broadcast(bandKeys(bench, n, numBands, seed, id, text)
        .withColumnRenamed(id, "__bid")), Seq("key"))
      .select(col(id), col("__bid")).distinct()
    val candIds = cand.select(col(id)).distinct()
    val docSets = wordShingles(docs.join(broadcast(candIds), Seq(id)),
        n, id, text)
      .groupBy(col(id)).agg(collect_set(col("shingle")).as("__sh"))
    val benchSets = wordShingles(bench, n, id, text)
      .groupBy(col(id)).agg(collect_set(col("shingle")).as("__bsh"))
      .withColumnRenamed(id, "__bid")
    val inter = size(array_intersect(col("__sh"), col("__bsh")))
      .cast("double")
    val uni = (size(col("__sh")) + size(col("__bsh"))).cast("double") - inter
    docSets.join(broadcast(cand), Seq(id))
      .join(broadcast(benchSets), Seq("__bid"))
      .select(col(id), (inter / uni).as("j"))
      .filter(col("j") >= minJ)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_matches"), round(max(col("j")), 6).as("max_j"))
  }

  /** Near-dup pairs at scale: MinHash banding for candidate generation
    * (bounded buckets, no all-pairs join, no fitted model), then EXACT
    * set Jaccard re-scoring of each candidate over the true shingle
    * sets (array_intersect on collect_set — no TF hash collisions), so
    * the output is exact over the surviving candidates and
    * oracle-checkable. Candidate membership is a key-equality fact, so
    * no distance slack is needed at the threshold boundary.
    */
  def minhashNearDupPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.5,
                          numBands: Int = 8, seed: Long = 42L,
                          id: String = "doc_id",
                          text: String = "text"): DataFrame = {
    val cand = minhashBandCandidates(docs, n, numBands, seed, id, text)
    val sets = wordShingles(docs, n, id, text)
      .groupBy(col(id)).agg(collect_set(col("shingle")).as("sh"))
    val inter = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
    val uni = (size(col("a.sh")) + size(col("b.sh"))).cast("double") - inter
    cand
      .join(sets.as("a"), cand("id_a") === col(s"a.$id"))
      .join(sets.as("b"), cand("id_b") === col(s"b.$id"))
      .select(col("id_a"), col("id_b"), (inter / uni).as("j_raw"))
      .filter(col("j_raw") >= minJ)
      .select(col("id_a"), col("id_b"), round(col("j_raw"), 6).as("jaccard"))
  }

  /** The dedup step itself: docs kept after dropping every non-minimal
    * member of each near-duplicate component (components of the
    * J ≥ minJ pair graph, resolved by the same alternating-star /
    * union-find machinery the KG canonicalization stage uses). The
    * survivor of a component is its min doc id — deterministic, and
    * oracle-checkable by a transitive-closure SQL twin.
    */
  def minhashSurvivors(docs: DataFrame, n: Int = 3, minJ: Double = 0.5,
                       numBands: Int = 8, seed: Long = 42L,
                       id: String = "doc_id",
                       text: String = "text"): DataFrame = {
    val pairs = minhashNearDupPairs(docs, n, minJ, numBands, seed, id, text)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = graft.canon.ConnectedComponents.run(pairs)
    // assignments IS the dropped set: the delta contract (see
    // ConnectedComponents.Result) returns only non-identity (id, comp)
    // rows, so every listed id is a non-minimal member by construction
    val dropped = cc.assignments.select(col("id").as(id))
    docs.select(col(id)).join(dropped, Seq(id), "left_anti")
  }

  /** Near-dup dedup keeping the BEST member of each duplicate cluster
    * by `qualityCol` (ties → min id) instead of the min-id member —
    * what production curation actually wants: when a document exists
    * in several near-identical variants, keep the longest / highest-
    * quality one, not whichever hashed lowest. Same pair graph and CC
    * machinery as [[minhashSurvivors]]; the representative choice is
    * one groupBy over (component, quality) — `min(struct(-q, id))` is
    * a deterministic argmax with the id tie-break, so re-runs and
    * repartitionings reproduce the same survivors.
    *
    * `qualityCol` must be numeric and non-null. Output: one (id) row
    * per cluster representative (singletons survive as themselves).
    */
  def minhashSurvivorsBy(docs: DataFrame, qualityCol: Column,
                         n: Int = 3, minJ: Double = 0.5,
                         numBands: Int = 8, seed: Long = 42L,
                         id: String = "doc_id",
                         text: String = "text"): DataFrame = {
    val pairs = minhashNearDupPairs(docs, n, minJ, numBands, seed, id, text)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = graft.canon.ConnectedComponents.run(pairs)
    val assign = cc.assignments.withColumnRenamed("id", id)
    docs.select(col(id), qualityCol.cast("double").as("__q"))
      .join(assign, Seq(id), "left")
      .withColumn("__comp", coalesce(col("comp"), col(id)))
      .groupBy("__comp")
      .agg(min(struct((col("__q") * -1.0).as("nq"), col(id).as(id))).as("m"))
      .select(col(s"m.$id").as(id))
  }
}
