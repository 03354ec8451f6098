package graft

import graft.functions.{RollingHash, functions => gf}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference implementation: string-indexed, recomputes
    * each window hash from scratch (no rolling update — different
    * code path than the kernel).
    */
  private def refMinHash(s: String, w0: Int): Long = {
    val b = s.getBytes("UTF-8")
    if (b.isEmpty) return 0L
    val w = math.min(w0, b.length)
    (0 to b.length - w).map { i =>
      var h = 0L
      for (k <- i until i + w) h = h * RollingHash.Base + (b(k) & 0xff)
      h
    }.min
  }

  test("rolling_minhash matches windowed-rescan reference") {
    val samples = Seq("", "a", "abc", "hello world hello world",
      "αβγ unicode ΔΕΖ", "the pipeline reads every file and emits rows",
      "x" * 500)
    for (s <- samples; w <- Seq(1, 4, 8, 16)) {
      val got = Seq(s).toDF("t")
        .select(gf.rolling_minhash($"t", w).as("h")).as[Long].head()
      assert(got == refMinHash(s, w), s"s=${s.take(20)} w=$w")
    }
  }

  test("shift-invariance: shared windows dominate the fingerprint") {
    val doc = "shared core content that dominates the hash space"
    val a = refMinHash("PREFIX " + doc, 8)
    val b = refMinHash("OTHER LEAD " + doc + " TRAIL", 8)
    // both contain all windows of `doc`; min over a superset can only
    // be <= — fingerprints collide when the minimal window is shared
    assert(a == b, "winnowing property: identical cores fingerprint equal")
  }

  test("expression runs inside whole-stage codegen (no fallback)") {
    val df = spark.range(100).select(
      gf.rolling_minhash(concat(lit("row"), $"id".cast("string")), 8).as("h"))
    // "*(n)" is the WholeStageCodegen marker in the plan string; the
    // Project containing the expression must carry it (a fallback
    // expression would break the span)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rolling_minhash"), plan)
    assert(df.distinct().count() > 90, "hashes should be near-unique")
  }

  test("SQL registration and null handling") {
    gf.register(spark)
    val out = spark.sql(
      "SELECT rolling_minhash(t, 4) AS h FROM VALUES ('abcd'), (NULL) AS v(t)")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0) == Some(refMinHash("abcd", 4)))
    assert(out(1).isEmpty, "null input must yield null")
  }

  test("minhash_sigs: permutation-min property, codegen span, empty -> null") {
    import graft.functions.MinHashSigs
    val sets = Seq(
      Seq("abc", "bcd", "cde"), Seq("abc"), Seq("xyz", "abc"),
      Seq.empty[String])
    val df = sets.toDF("sh")
      .select(MinHashSigs($"sh", 8, 42L).as("sigs"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getSeq[Long](0))
    // empty set must be null (no colliding sentinel band keys)
    assert(got(3) == null)
    // set-min property: sigs of a union are the elementwise min of the
    // parts — the defining MinHash identity, checked across code paths
    val sub = Seq(Seq("abc", "bcd"), Seq("cde")).toDF("sh")
      .select(MinHashSigs($"sh", 8, 42L).as("sigs"))
      .collect().map(_.getSeq[Long](0))
    val elementwiseMin = sub(0).zip(sub(1)).map { case (x, y) => math.min(x, y) }
    assert(got(0) == elementwiseMin)
    // identical single-element sets agree on every signature; distinct
    // elements disagree on most
    assert(got(1) == Seq(Seq("abc")).toDF("sh")
      .select(MinHashSigs($"sh", 8, 42L)).head().getSeq[Long](0))
    // stays inside whole-stage codegen (literal inputs constant-fold
    // into a LocalTableScan, so probe with a non-foldable source)
    val plan = spark.range(50)
      .select(MinHashSigs(array(concat(lit("s"), $"id".cast("string"))), 8, 42L)
        .as("sigs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("minhash_sigs"), plan)
    // P(collision) = Jaccard: {abc} vs {xyz, abc} share abc -> J=0.5;
    // with 8 sigs expect ~4 agreements, never 0 nor 8 for this seed
    val agree = got(1).zip(got(2)).count { case (x, y) => x == y }
    assert(agree > 0 && agree < 8, s"agreements=$agree")
  }

  test("minhash_sigs over array<long>: set-min property, codegen, empty -> null") {
    import graft.functions.MinHashSigs
    // the hashed-shingle linking path feeds pre-hashed elements; the
    // long kernel must satisfy the same MinHash identities
    val sets = Seq(Seq(11L, 22L, 33L), Seq(11L), Seq(99L, 11L), Seq.empty[Long])
    val got = sets.toDF("sh")
      .select(MinHashSigs($"sh", 8, 42L).as("sigs"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got(3) == null, "empty set must be null")
    val sub = Seq(Seq(11L, 22L), Seq(33L)).toDF("sh")
      .select(MinHashSigs($"sh", 8, 42L).as("sigs"))
      .collect().map(_.getSeq[Long](0))
    val elementwiseMin = sub(0).zip(sub(1)).map { case (x, y) => math.min(x, y) }
    assert(got(0) == elementwiseMin, "sigs(A ∪ B) must equal min(sigs(A), sigs(B))")
    // J=0.5 pair agrees on some but not all signatures
    val agree = got(1).zip(got(2)).count { case (x, y) => x == y }
    assert(agree > 0 && agree < 8, s"agreements=$agree")
    // long input must NOT shortcut to identity permutations of the
    // elements: the base re-mix (XXH64.hashLong) keeps the signature
    // family independent of the caller's element hashing, so the sig
    // of {11} is not any affine image of 11 shared with {11L+2^32}
    assert(got(1) != Seq(Seq(11L)).toDF("sh")
      .select(MinHashSigs(org.apache.spark.sql.functions.transform(
        $"sh", c => c + org.apache.spark.sql.functions.lit(1L << 32)), 8, 42L))
      .head().getSeq[Long](0))
    // stays inside whole-stage codegen with a non-foldable source
    val plan = spark.range(50)
      .select(MinHashSigs(array($"id", $"id" + 1L), 8, 42L).as("sigs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("minhash_sigs"), plan)
  }

  test("sign_lsh_bands: empty/all-zero vectors -> null, never colliding sentinel keys") {
    import graft.functions.SignLshBands
    import graft.ops.Similarity
    val vecs = Seq(
      (1L, Seq(1.0, -2.0, 3.0)),
      (2L, Seq(0.0, 0.0, 0.0)), // all-zero: no direction, no keys
      (3L, Seq.empty[Double]),
      (4L, Seq(0.0, 0.0, 0.0)))
    val df = vecs.toDF("vec_id", "embedding")
    val keys = df.select($"vec_id", SignLshBands($"embedding", 8, 16, 42L).as("k"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(keys(1L) != null && keys(1L).size == 8)
    assert(keys(2L) == null && keys(3L) == null && keys(4L) == null,
      "degenerate vectors must yield null band keys")
    // interpreted eval agrees with the codegen path on the null contract
    assert(graft.functions.SignLsh.bandKeysOf(Array(0.0, 0.0), 8, 16, 42L) == null)
    // and the candidate generator therefore never pairs zero vectors
    // with each other (the quadratic blowup the null contract prevents)
    val cand = Similarity.signLshCandidates(df)
      .as[(Long, Long)].collect().toSet
    assert(!cand.contains((2L, 4L)), s"zero vectors collided: $cand")
  }

  test("sorted_intersect_count == set intersection; codegen span; scorer parity") {
    import graft.functions.SortedIntersectCount
    val rnd = new scala.util.Random(7)
    val cases = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L)))
    val got = cases.toDF("a", "b")
      .select(SortedIntersectCount($"a", $"b").as("n"))
      .as[Int].collect()
    cases.zip(got).foreach { case ((a, b), n) =>
      assert(n == (a.toSet & b.toSet).size, s"$a ∩ $b")
    }
    // inside whole-stage codegen with a non-foldable source
    val plan = spark.range(50)
      .select(SortedIntersectCount(
        sort_array(array($"id", $"id" + 7L)),
        sort_array(array($"id", $"id" + 3L))).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("sorted_intersect_count"),
      plan)
    // the linking scorer's Jaccard is unchanged by the swap: the
    // withShingles arrays are sorted at the source, and the merge
    // count over them equals array_intersect's size
    import graft.link.Linking
    val ents = Linking.entitiesOf(Seq("alpha-beta", "alpha-beta.",
        "alpha-begamma", "unrelated-zzz").toDF("obj")
      .withColumn("pred", lit("tagged")))
    val sh = Linking.withShingles(ents, 3)
    val both = sh.as("sa").crossJoin(sh.as("sb"))
      .select(
        SortedIntersectCount($"sa.shingles", $"sb.shingles").as("merge"),
        size(array_intersect($"sa.shingles", $"sb.shingles")).as("hash"))
      .as[(Int, Int)].collect()
    assert(both.forall { case (m, h) => m == h }, both.mkString(","))
  }
}
