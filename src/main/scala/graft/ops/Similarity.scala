package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k as pure column expressions
  * (`zip_with` dot product inside whole-stage codegen) — one scan, one
  * small top-k sort, correct at any scale but O(n) per query.
  *
  * Scale paths (no fitted models anywhere — every key is a
  * deterministic function of (vector, seed)): hyperplane sign-LSH
  * banding for both near-dup pair generation and single-query top-k
  * probing, and an IVF index (driver-trained coarse quantizer on a
  * bounded sample, literal-centroid codegen assignment, probe-pruned
  * exact scoring). A 100 TB corpus probes band buckets / inverted
  * lists instead of scanning.
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

  /** Approximate top-k by cosine via sign-LSH band probing — the
    * single-query twin of [[nearDupPairs]]'s candidate machinery, and
    * deterministic (no fitted model: band keys are a pure function of
    * (vector, seed), the same [[graft.functions.SignLshBands]] kernel).
    *
    * Probe = rows sharing at least one (band, key) with the QUERY's
    * band keys, computed driver-side — a pure codegen'd map filter
    * (literal key comparisons), no join, no shuffle; survivors get
    * exact cosine + top-k. Sign bits are scale-invariant, so no
    * normalization pass is needed on either side.
    *
    * Band shape differs from near-dup detection deliberately: top-k
    * neighbors on a realistic corpus sit at moderate angles (cos
    * 0.4–0.7), where 16 AND-ed bits would collide almost never. Fewer
    * bits per band + more bands (defaults 8 × 32) put the S-curve at
    * that range: cos 0.6 probes with p ≈ 0.87 while the orthogonal
    * background passes ≈ 2^-8 per band (≈ 12% of the corpus over 32
    * bands) — the probe scans ~1/8th of what brute force scans, and at
    * a stored table the band keys are the bucketing columns, making
    * each probe a pruned scan.
    */
  def lshTopK(embs: DataFrame, q: Seq[Double], k: Int,
              bands: Int = 32, bitsPerBand: Int = 8,
              seed: Long = 42L, id: String = "vec_id",
              emb: String = "embedding"): DataFrame = {
    val qKeys = graft.functions.SignLsh.bandKeysOf(q.toArray, bands,
      bitsPerBand, seed)
    require(qKeys != null, "lshTopK: query vector is empty or all-zero")
    val keyed = embs.select(col(id), col(emb),
      graft.functions.SignLshBands(
        expr(s"transform($emb, x -> cast(x as double))"),
        bands, bitsPerBand, seed).as("__keys"))
    val hit = (0 until bands).map(b =>
      col("__keys").getItem(b) === lit(qKeys(b))).reduce(_ || _)
    keyed.filter(col("__keys").isNotNull && hit)
      .select(col(id), round(cosineTo(col(emb), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(id).asc)
      .limit(k)
  }

  /** Candidate near-dup pairs from hyperplane sign-LSH banding: ids
    * sharing at least one (band, key), where band keys come from the
    * codegen'd [[graft.functions.SignLshBands]] expression (`bands`
    * keys × `bitsPerBand` Rademacher sign bits per row, one tight
    * kernel pass inside whole-stage codegen).
    *
    * Why this and not MLlib's BucketedRandomProjectionLSH: BRP-LSH has
    * no AND-amplification (1 projection per table), so for unit
    * vectors a random pair (distance ≈ √2) collides per table with
    * p ≈ 0.14 at bucketLength 0.5 — OR over a few tables makes ~half
    * of ALL pairs candidates, a disguised all-pairs join. AND-ing
    * `bitsPerBand` sign bits drives a random pair's per-band collision
    * to 2^-bits (≈1.5e-5 at 16 bits) while a near-identical pair
    * (cos ≥ 0.98 ⇒ flip prob θ/π ≤ 0.064 per bit) still collides with
    * ≥ (1−θ/π)^bits per band, OR-amplified across bands. The self-join
    * is on exact 64-bit compound keys, so the candidate set grows
    * ~linearly with n, not n².
    */
  private[graft] def signLshCandidates(embs: DataFrame, bands: Int = 8,
                                       bitsPerBand: Int = 16,
                                       seed: Long = 42L,
                                       id: String = "vec_id",
                                       emb: String = "embedding"): DataFrame = {
    val keyed = embs
      .select(col(id), graft.functions.SignLshBands(
        expr(s"transform($emb, x -> cast(x as double))"),
        bands, bitsPerBand, seed).as("keys"))
      .select(col(id), posexplode(col("keys")).as(Seq("band", "key")))
    keyed.as("a").join(keyed.as("b"), Seq("band", "key"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
  }

  /** dot(a, b) over two array<double> columns as a codegen'd
    * higher-order expression.
    */
  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** The quantizer training sample: the `maxSample` rows with the
    * SMALLEST xxhash64(id, seed) — a deterministic uniform sample whose
    * size is bounded BY CONSTRUCTION at any corpus size (the round-3
    * `sampleMod=1` default collected the whole table to the driver;
    * this can't). The hash-ordered limit plans as TakeOrderedAndProject
    * (per-partition top-k, merged on the driver — never a full sort,
    * never a full collect), and the (hash, id) sort key is a total
    * order, so the sample is independent of partitioning.
    */
  private[graft] def ivfSample(embs: DataFrame, maxSample: Int, seed: Long,
                               id: String, emb: String): Array[Array[Double]] = {
    val collected = embs
      .select(expr(s"transform($emb, x -> cast(x as double))").as("e"),
        xxhash64(col(id), lit(seed)).as("__h"), col(id).as("__id"))
      .orderBy(col("__h").asc, col("__id").asc)
      .limit(maxSample)
      .select("e")
      .collect().map(_.getSeq[Double](0).toArray)
    require(collected.length <= maxSample,
      s"sample ${collected.length} exceeds bound $maxSample")
    collected
  }

  /** IVF coarse quantizer, trained driver-side on a DETERMINISTIC
    * bounded hash-sample ([[ivfSample]]: the maxSample hash-smallest
    * rows — no RNG, no unbounded collect): spherical Lloyd iterations,
    * seeded farthest-point-ish init from the sample order. Training on
    * a bounded sample is the standard IVF recipe — the quantizer needs
    * the coarse geometry, not the corpus — and `maxSample` caps driver
    * memory at any corpus size by construction.
    */
  def ivfTrain(embs: DataFrame, k: Int = 16, iters: Int = 10,
               maxSample: Int = 65536, seed: Long = 42L,
               id: String = "vec_id",
               emb: String = "embedding"): Array[Array[Double]] = {
    require(maxSample >= k, s"maxSample $maxSample < k=$k")
    val sample = ivfSample(embs, maxSample, seed, id, emb)
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(unit)
    var centroids = pts.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](pts.head.length))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < p.length) { d += p(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = (0 until k).map { c =>
        if (counts(c) == 0) centroids(c) else unit(sums(c))
      }.toArray
      it += 1
    }
    centroids
  }

  /** Inverted-list assignment: each vector tagged with the id of its
    * max-cosine centroid. The centroid table is a LITERAL array in the
    * plan (k × dim doubles — a few KB), so assignment is a pure
    * codegen'd map with no shuffle and no UDF; at scale the output is
    * written partitioned/bucketed by `list_id`, making every probe a
    * partition-pruned scan.
    */
  def ivfAssign(embs: DataFrame, centroids: Array[Array[Double]],
                id: String = "vec_id",
                emb: String = "embedding"): DataFrame = {
    val cLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    val e = expr(s"transform($emb, x -> cast(x as double))")
    // cosine argmax == dot argmax after the vector's own norm cancels;
    // negate for array_min/array_position (1-based)
    val negDots = transform(cLit, c => -dotCol(e, c))
    embs.withColumn("list_id",
      (array_position(negDots, array_min(negDots)) - 1).cast("int"))
  }

  /** The probe set: indexes of the `nProbe` centroids nearest the
    * query (driver-side — k dot products), deterministic tie-break by
    * index.
    */
  private def probeLists(centroids: Array[Array[Double]], q: Seq[Double],
                         nProbe: Int): Array[Int] = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    val qu = q.map(_ / qn).toArray
    centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qu).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (d, i) => (-d, i) }.take(nProbe).map(_._2)
  }

  private def probeTopK(probed: DataFrame, q: Seq[Double], k: Int,
                        id: String, emb: String): DataFrame =
    probed.select(col(id), round(cosineTo(col(emb), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(id).asc)
      .limit(k)

  /** ANN top-k through the IVF index: rank centroids against the query
    * on the driver (k dot products), probe the `nProbe` nearest lists
    * only, exact cosine inside the probed lists. Recall/latency dials:
    * nProbe=k degenerates to exact brute force; nProbe=1 scans ~n/k
    * rows.
    */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              q: Seq[Double], k: Int, nProbe: Int = 4,
              id: String = "vec_id",
              emb: String = "embedding"): DataFrame = {
    val probes = probeLists(centroids, q, nProbe)
    probeTopK(
      assigned.filter(col("list_id").isin(probes.map(Integer.valueOf): _*)),
      q, k, id, emb)
  }

  /** STORAGE layout of the IVF index: inverted lists persisted
    * PARTITIONED BY list_id, so at 100 TB a probe is a
    * partition-pruned scan of nProbe directories (~nProbe/k of the
    * corpus touches storage) instead of an in-memory filter over
    * everything. This is the serving shape — build once with
    * ivfAssign, query forever with [[ivfTopKStored]].
    */
  def ivfWriteIndex(assigned: DataFrame, dir: String): Unit =
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(dir)

  /** [[ivfTopK]] against a stored index: the list_id IN (...) filter
    * lands in the scan's PartitionFilters (plan-asserted in OpsSpec),
    * so only the probed list directories are read — same results as
    * the in-memory path.
    */
  def ivfTopKStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                    centroids: Array[Array[Double]], q: Seq[Double],
                    k: Int, nProbe: Int = 4,
                    id: String = "vec_id",
                    emb: String = "embedding"): DataFrame = {
    val probes = probeLists(centroids, q, nProbe)
    probeTopK(
      spark.read.parquet(dir)
        .filter(col("list_id").isin(probes.map(Integer.valueOf): _*)),
      q, k, id, emb)
  }

  /** Near-duplicate pairs at scale: sign-LSH banding for candidate
    * generation (equality join on compound band keys — selective even
    * on random corpora), then EXACT cosine re-scoring of each candidate
    * as a codegen'd column expression. The re-score makes the output
    * exact over the surviving candidates (and therefore
    * oracle-checkable); candidate membership is a key-equality fact,
    * so no distance slack is needed at the threshold boundary.
    */
  def nearDupPairs(embs: DataFrame, minCos: Double,
                   bands: Int = 8, bitsPerBand: Int = 16,
                   seed: Long = 42L,
                   id: String = "vec_id",
                   emb: String = "embedding"): DataFrame = {
    val cand = signLshCandidates(embs, bands, bitsPerBand, seed, id, emb)
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

  /** Embedding-space dedup survivors: [[nearDupPairs]] edges →
    * connected components → keep each component's minimum id (plus
    * every singleton). The embedding twin of
    * [[Dedup.minhashSurvivors]], closing the same loop for
    * vector-represented corpora (semantic near-dups that share no
    * n-grams). CC returns only the non-identity delta, so the listed
    * ids ARE the dropped set; one anti-join finishes it.
    */
  def lshDedupSurvivors(embs: DataFrame, minCos: Double,
                        bands: Int = 8, bitsPerBand: Int = 16,
                        seed: Long = 42L,
                        id: String = "vec_id",
                        emb: String = "embedding"): DataFrame = {
    val pairs = nearDupPairs(embs, minCos, bands, bitsPerBand, seed, id, emb)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val dropped = graft.canon.ConnectedComponents.run(pairs)
      .assignments.select(col("id").as(id))
    embs.select(col(id)).join(dropped, Seq(id), "left_anti")
  }
}
