package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors, VectorUDT}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k as pure column expressions
  * (`zip_with` dot product inside whole-stage codegen) — one scan, one
  * small top-k sort, correct at any scale but O(n) per query.
  *
  * Scale path: random-projection LSH (MLlib BucketedRandomProjectionLSH
  * over L2-normalized vectors; Euclidean distance on the unit sphere is
  * monotone in cosine: d² = 2 − 2·cos). Candidates come from hash
  * buckets, so a 100 TB corpus probes buckets instead of scanning.
  */
object Similarity {

  /** cosine(embedding, q) as a column expression (computed in double). */
  def cosineTo(emb: Column, q: Seq[Double]): Column = {
    val qArr = array(q.map(lit): _*)
    val dot = aggregate(zip_with(emb, qArr,
      (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x)
    val nA = sqrt(aggregate(transform(emb,
      x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    val nQ = math.sqrt(q.map(x => x * x).sum)
    dot / (nA * lit(nQ))
  }

  /** Brute-force cosine top-k against one query vector. */
  def cosineTopK(embs: DataFrame, q: Seq[Double], k: Int,
                 id: String = "vec_id",
                 emb: String = "embedding"): DataFrame =
    embs.select(col(id), round(cosineTo(col(emb), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(id).asc)
      .limit(k)

  /** TEST-ORACLE ONLY: exact near-duplicate pairs via a cartesian
    * self-join — O(n²), never call this on an unbounded table. The
    * production operator is [[nearDupPairs]] (LSH bucket join + exact
    * re-score); this stays as the brute-force reference its recall is
    * verified against.
    */
  private[graft] def cosineNearDupPairs(embs: DataFrame, minCos: Double,
                         id: String = "vec_id",
                         emb: String = "embedding"): DataFrame = {
    val dotAB = aggregate(zip_with(col(s"a.$emb"), col(s"b.$emb"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    def norm(side: String) = sqrt(aggregate(transform(col(s"$side.$emb"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    embs.as("a").crossJoin(embs.as("b"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        round(dotAB / (norm("a") * norm("b")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** L2-normalized MLlib vectors for the LSH path (accepts float or
    * double arrays — normalized to double before the UDF boundary).
    */
  private def withUnitVectors(embs: DataFrame, id: String,
                              emb: String): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val toVec = udf { (a: Seq[Double]) =>
      val arr = a.toArray
      val n = math.sqrt(arr.map(x => x * x).sum)
      Vectors.dense(if (n == 0) arr else arr.map(_ / n))
    }
    embs.select(col(id),
      toVec(expr(s"transform($emb, x -> cast(x as double))")).as("unit"))
  }

  /** Approximate top-k by cosine via random-projection LSH buckets. */
  def lshTopK(embs: DataFrame, q: Seq[Double], k: Int,
              bucketLength: Double = 0.5, numHashTables: Int = 4,
              seed: Long = 42L, id: String = "vec_id",
              emb: String = "embedding"): DataFrame = {
    val unit = withUnitVectors(embs, id, emb)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val model = lsh.fit(unit)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val qv = Vectors.dense(q.map(_ / qn).toArray)
    val nn = model.approxNearestNeighbors(unit, qv, k, "dist")
    // on unit vectors: cos = 1 - d^2 / 2
    nn.select(col(id),
      round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cos"))
  }

  /** Near-duplicate pairs at scale: random-projection LSH bucket join
    * for candidate generation, then EXACT cosine re-scoring of each
    * candidate as a codegen'd column expression — the bucketed path
    * prunes the O(n²) pair space; the re-score makes the output exact
    * over the surviving candidates (and therefore oracle-checkable).
    * The LSH distance filter runs slightly loose (minCos − slack) so
    * the exact filter, not floating-point noise at the boundary,
    * decides membership.
    */
  def nearDupPairs(embs: DataFrame, minCos: Double,
                   bucketLength: Double = 0.5, numHashTables: Int = 4,
                   seed: Long = 42L, slack: Double = 0.01,
                   id: String = "vec_id",
                   emb: String = "embedding"): DataFrame = {
    val cand = lshNearDupPairs(embs, math.max(-1.0, minCos - slack),
        bucketLength, numHashTables, seed, id, emb)
      .select(col("id_a"), col("id_b"))
    val dotAB = aggregate(zip_with(col(s"a.$emb"), col(s"b.$emb"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    def norm(side: String) = sqrt(aggregate(transform(col(s"$side.$emb"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    cand
      .join(embs.as("a"), cand("id_a") === col(s"a.$id"))
      .join(embs.as("b"), cand("id_b") === col(s"b.$id"))
      .select(col("id_a"), col("id_b"),
        (dotAB / (norm("a") * norm("b"))).as("cos_raw"))
      // filter on the unrounded value (like a SQL twin would), round
      // only for output
      .filter(col("cos_raw") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos"))
  }

  /** Approximate near-dup pairs via LSH self-join on unit vectors. */
  def lshNearDupPairs(embs: DataFrame, minCos: Double,
                      bucketLength: Double = 0.5, numHashTables: Int = 4,
                      seed: Long = 42L, id: String = "vec_id",
                      emb: String = "embedding"): DataFrame = {
    val unit = withUnitVectors(embs, id, emb)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val model = lsh.fit(unit)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCos))
    model.approxSimilarityJoin(unit, unit, maxDist, "dist")
      .filter(col(s"datasetA.$id") < col(s"datasetB.$id"))
      .select(col(s"datasetA.$id").as("id_a"),
        col(s"datasetB.$id").as("id_b"),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cos"))
  }
}
