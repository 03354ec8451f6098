package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash groupBy), n-gram Jaccard (relational, oracle-checkable),
  * SimHash (bit-sign aggregate + banded candidate join), and
  * MinHash-LSH (MLlib). Embedding-cosine near-dup lives in Similarity.
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

  /** Word n-gram shingles: (id, shingle), distinct per doc. */
  def wordShingles(docs: DataFrame, n: Int, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    docs.select(col(id), explode(array_distinct(expr(
      s"""transform(
         |  sequence(1, greatest(size(split(trim($text), '\\\\s+')) - ${n - 1}, 1)),
         |  i -> array_join(slice(split(trim($text), '\\\\s+'), i, $n), ' '))""".stripMargin
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

  /** 64-bit SimHash of the word multiset, as 64 sign-sum aggregates
    * over xxhash64(word) bits — pure column expressions, map-side
    * combined, no UDF.
    */
  def simhash(docs: DataFrame, id: String = "doc_id",
              text: String = "text"): DataFrame = {
    val wordsDf = docs.select(col(id),
      explode(split(trim(col(text)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("h", xxhash64(col("word")))
    val bitSums = (0 until 64).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
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
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup pairs at scale: MinHash-LSH banding for candidate
    * generation (bounded buckets, no all-pairs join), then EXACT set
    * Jaccard re-scoring of each candidate over the true shingle sets
    * (array_intersect on collect_set — no TF hash collisions), so the
    * output is exact over the surviving candidates and
    * oracle-checkable. The LSH distance filter runs loose (`slack`) so
    * the exact filter decides membership at the threshold boundary.
    */
  def minhashNearDupPairs(docs: DataFrame, n: Int = 3, minJ: Double = 0.5,
                          numHashTables: Int = 8, seed: Long = 42L,
                          slack: Double = 0.1,
                          id: String = "doc_id",
                          text: String = "text"): DataFrame = {
    val cand = minhashPairs(docs, n, math.min(1.0, 1.0 - minJ + slack),
        numHashTables, seed, id, text)
      .select(col("id_a"), col("id_b"))
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

  /** MinHash-LSH near-dup candidates over word shingles (MLlib),
    * Jaccard distance ≤ maxDist. Deterministic via fixed seed.
    */
  def minhashPairs(docs: DataFrame, n: Int = 3, maxDist: Double = 0.3,
                   numHashTables: Int = 5, seed: Long = 42L,
                   id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = wordShingles(docs, n, id, text)
      .groupBy(col(id)).agg(collect_set(col("shingle")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(sh)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDist, "dist")
      .filter(col(s"datasetA.$id") < col(s"datasetB.$id"))
      .select(col(s"datasetA.$id").as("id_a"),
        col(s"datasetB.$id").as("id_b"),
        round(lit(1.0) - col("dist"), 6).as("jaccard"))
  }
}
