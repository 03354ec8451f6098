package graft.tools

import graft.link.Linking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pathological-bucket bench (round-4 verdict #3): plants a
  * mass-duplicated entity — tens of thousands of DISTINCT surface
  * forms that all land in the SAME band bucket in every band — into
  * the 200k-file bench corpus's entity table, and measures that the
  * [[Linking.Config.maxBandBucket]] star guard keeps candidate volume
  * at ~s instead of the C(s,2)·bands clique bound, with connectivity
  * preserved end-to-end.
  *
  * Plant construction. A band bucket of size s needs all s members to
  * agree on that band's rowsPerBand min-hashes, i.e. to share the
  * min-hashed shingles — so every member's BLOCKING set must be
  * identical (up to elements that never take a minimum). The variants
  * are `core + "-ab" + bin16(i)`:
  *  - the core's shingles (plus the two fixed boundary shingles) are
  *    shared by every variant — df = s, which must stay AT OR BELOW
  *    the stop-shingle cap or the whole bucket is defused;
  *  - the id-bearing tail's shingles all come from the tiny {a,b}³
  *    pool, which the chaff population pushes ABOVE the cap — hot,
  *    removed from blocking — so no data-dependent shingle survives
  *    into any variant's blocking set.
  * Net: all s variants share one blocking set → one bucket per band.
  *
  * This also demonstrates the engine's LAYERED defense: bucket size is
  * bounded by the stop cap BY CONSTRUCTION (a bucket of size s implies
  * a blocking shingle with df ≥ s; shingles past the cap never block),
  * so a plant LARGER than the cap — the literal "50k copies" scenario
  * at this corpus size — is dissolved by the stop filter before the
  * star guard is even consulted. The guard owns the middle regime
  * maxBandBucket < s ≤ cap, which is exactly what this plants.
  *
  * Usage: runMain graft.tools.PlantedBench [nPlant] [nChaff]
  * Env:   SPARK_GRAFT_FILES_DIR (default /dev/shm/gr/corpus200),
  *        SPARK_GRAFT_CPUS (default 32)
  */
object PlantedBench {
  val Core = "the-grand-unified-entity-of-mass-duplication"

  /** 16-char {a,b} encoding of i (distinct per i below 65536). */
  private def bin16(i: Long): String =
    (0 until 16).map(b => if (((i >> b) & 1L) == 1L) 'b' else 'a').mkString

  /** The planted variant forms: distinct norms, identical blocking
    * sets once {a,b}³ shingles are hot.
    */
  def variants(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong)
      .map(i => Core + "-ab" + bin16(i))
      .toDF("obj").withColumn("pred", lit("mentions_domain"))
  }

  /** Chaff: forms made ONLY of {a,b}³ shingles. They push the data-
    * tail shingle pool over the stop cap, and their own blocking sets
    * go empty (all-stop) — they never enter banding at all.
    */
  def chaff(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong)
      // odd multiplier → j ↦ low 24 bits is a bijection mod 2^24, so
      // all chaff forms are distinct by construction
      .map(j => (0 until 24).map(b =>
        if (((j * 2654435761L >> b) & 1L) == 1L) 'b' else 'a').mkString)
      .toDF("obj").withColumn("pred", lit("mentions_domain"))
      // keep chaff distinct from variants (no Core prefix) and unique
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val nPlant = args.headOption.map(_.toInt).getOrElse(35000)
    val nChaff = args.lift(1).map(_.toInt).getOrElse(30000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val corpus = sys.env.getOrElse("SPARK_GRAFT_FILES_DIR",
      "/dev/shm/gr/corpus200")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-planted-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // organic entities from the bench corpus (same extraction the
    // pipeline runs), then the plant unioned in
    val files = spark.read.parquet(corpus).as[graft.SourceFile]
    val triples = graft.extract.Extraction.triples(
      graft.extract.Extraction.extract(files))
    val organic = Linking.entities(triples)
    val plantForms = variants(spark, nPlant).unionByName(chaff(spark, nChaff))
    val ents = organic.unionByName(Linking.entitiesOf(plantForms))
      .cache()
    val nEnts = ents.count()
    val cfg = Linking.Config()
    val cap = cfg.stopShingleCap(nEnts)
    println(s"[planted] entities=$nEnts (organic + plant) stopCap=$cap " +
      s"plant=$nPlant chaff=$nChaff maxBandBucket=${cfg.maxBandBucket}")
    require(nPlant > cfg.maxBandBucket && nPlant <= cap,
      s"plant $nPlant must sit in (maxBandBucket=${cfg.maxBandBucket}, cap=$cap]")

    // plant-visible candidate volume through the guard
    val fuzzy = ents.filter(col("pred").isin(Linking.FuzzyPreds: _*))
    val plantIds = Linking.entitiesOf(
        variants(spark, nPlant)).select(col("entityId"))
    val shingled = Linking.withShingles(fuzzy, cfg.shingleSize)
    val t0 = System.nanoTime()
    val cand = Linking.lshCandidates(shingled, cfg, nEnts)
    val plantCand = cand
      .join(broadcast(plantIds.withColumnRenamed("entityId", "src")), Seq("src"))
      .join(broadcast(plantIds.withColumnRenamed("entityId", "dst")), Seq("dst"))
      .count()
    val candSec = (System.nanoTime() - t0) / 1e9
    val starExpect = cfg.bands.toLong * (nPlant - 1)
    val cliqueBound = cfg.bands.toLong * nPlant.toLong * (nPlant - 1) / 2
    println(f"[planted] plantCandidates=$plantCand (star expect $starExpect; " +
      f"clique bound $cliqueBound, ratio ${cliqueBound.toDouble / math.max(plantCand, 1)}%.0fx) " +
      f"candWall=$candSec%.1fs")
    require(plantCand == starExpect,
      s"guard must collapse the bucket to one star per band: " +
        s"$plantCand != $starExpect")

    // end-to-end: edges + canonicalization — the plant must collapse
    // to ONE canonical entity, organic results unaffected
    val t1 = System.nanoTime()
    val links = Linking.linkEdges(ents, cfg, Some(true), Some(nEnts))
    val (assign, _) = graft.Pipeline.assignCanonical(ents, links)
    val plantCanon = assign
      .join(broadcast(plantIds), Seq("entityId"))
      .select(col("canonicalId")).distinct().count()
    val linkSec = (System.nanoTime() - t1) / 1e9
    println(f"[planted] linkEdges+assign wall=$linkSec%.1fs " +
      f"plantCanonicalIds=$plantCanon (expect 1)")
    require(plantCanon == 1L,
      s"planted variants must canonicalize to one entity, got $plantCanon")
    println("[planted] OK")
    spark.stop()
  }
}
