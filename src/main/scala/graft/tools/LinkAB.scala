package graft.tools

import graft.link.Linking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 same-JVM interleaved A/B over the link stage's candidate +
  * scoring phases on a materialized entity snapshot.
  *
  * Variants:
  *  - old   : round-7 shape — (pred, band, key) banded rows, window
  *            census partitioned by the 3-part key with the pred
  *            string, scoring join keyed on (entityId, pred) with
  *            (pred, src, dst) candidate rows (inline replica);
  *  - new   : what Linking ships after round 8 — pred AND band folded
  *            into one 8-byte band-key hash (banded rows
  *            (entityId, key)), census keyed on the single long,
  *            candidates (src, dst), scoring join keyed on entityId
  *            alone with SHUFFLE_HASH on the sets build side.
  * Both print their output pair count so set equality is visible.
  *
  * Usage: runMain graft.tools.LinkAB <runDir-with-entities> [reps]
  */
object LinkAB {
  def main(args: Array[String]): Unit = {
    val runDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = Linking.Config()
    val ents = graft.store.Snapshots.read(spark, runDir, "entities")
    val n = ents.count()
    val fuzzy = ents.filter(col("pred").isin(Linking.FuzzyPreds: _*))
    val dir = s"$runDir/_scratch/link_ab"
    Linking.withShingles(fuzzy, cfg.shingleSize)
      .select(col("pred"), col("entityId"), col("shingles"))
      .write.mode("overwrite").parquet(dir)
    val shingled = spark.read.parquet(dir)
    val nHashes = cfg.bands * cfg.rowsPerBand

    // ---- round-7 replica ------------------------------------------
    // stop-shingle census shared by both variants (identical blocking
    // universe — the A/B isolates the key width, nothing else)
    val hot = Linking.hotShingles(shingled, cfg.stopShingleCap(n))
    val byPred = hot.groupBy(_._1).map { case (p, v) => p -> v.map(_._2) }
    val bshCol =
      if (hot.isEmpty) col("shingles")
      else byPred.foldLeft(col("shingles")) { case (acc, (p, shs)) =>
        when(col("pred") === p,
          array_except(col("shingles"), array(shs.map(lit): _*))).otherwise(acc)
      }

    def bandedOld(): DataFrame = {
      val keys = shingled
        .withColumn("bsh", bshCol)
        .select(col("pred"), col("entityId"),
          graft.functions.MinHashSigs(col("bsh"), nHashes, cfg.seed)
            .as("sigs"))
        .filter(col("sigs").isNotNull)
      val bandStructs = (0 until cfg.bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until cfg.rowsPerBand).map(r =>
            col("sigs").getItem(b * cfg.rowsPerBand + r)): _*).as("key"))
      }
      keys.select(col("pred"), col("entityId"),
          explode(array(bandStructs: _*)).as("bk"))
        .select(col("pred"), col("entityId"),
          col("bk.band").as("band"), col("bk.key").as("key"))
    }
    def candOld(): DataFrame = {
      val banded = bandedOld()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pred", "band", "key")
      val sized = banded
        .withColumn("center", min(col("entityId")).over(w))
        .withColumn("bn", count(lit(1)).over(w))
        .filter(col("bn") > 1)
      val star = sized
        .filter(col("bn") > cfg.maxBandBucket &&
          col("entityId") =!= col("center"))
        .select(col("pred"), col("center").as("src"),
          col("entityId").as("dst"))
      val clique = sized.filter(col("bn") <= cfg.maxBandBucket)
        .groupBy("pred", "band", "key")
        .agg(sort_array(collect_list(col("entityId"))).as("ids"))
        .select(col("pred"), col("ids"),
          posexplode(col("ids")).as(Seq("i", "x")))
        .select(col("pred"), col("x"),
          explode(expr("slice(ids, i + 2, size(ids) - i - 1)")).as("y"))
        .select(col("pred"), col("x").as("src"), col("y").as("dst"))
      star.unionByName(clique)
    }
    def scoreOld(cand: DataFrame): Long = {
      val sets = shingled
      val inter = graft.functions.SortedIntersectCount(
        col("sa.shingles"), col("sb.shingles")).cast("double")
      val uni = (size(col("sa.shingles")) + size(col("sb.shingles")))
        .cast("double") - inter
      cand
        .join(sets.as("sa"), cand("src") === col("sa.entityId") &&
          cand("pred") === col("sa.pred"))
        .join(sets.as("sb"), cand("dst") === col("sb.entityId") &&
          cand("pred") === col("sb.pred"))
        .select(col("src"), col("dst"), (inter / uni).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct().count()
    }
    // ---- shipped (round-8) path -----------------------------------
    def scoreNew(): Long = {
      val cand = Linking.lshCandidates(shingled, cfg, n)
      val sets = shingled.select(col("entityId"), col("shingles"))
      val inter = graft.functions.SortedIntersectCount(
        col("sa.shingles"), col("sb.shingles")).cast("double")
      val uni = (size(col("sa.shingles")) + size(col("sb.shingles")))
        .cast("double") - inter
      val pairs = cand.select(col("src"), col("dst"))
      pairs
        .join(sets.as("sa").hint("SHUFFLE_HASH"),
          pairs("src") === col("sa.entityId"))
        .join(sets.as("sb").hint("SHUFFLE_HASH"),
          pairs("dst") === col("sb.entityId"))
        .select(col("src"), col("dst"), (inter / uni).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct().count()
    }
    def run(tag: String, f: () => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f()
      println(f"[linkab] $tag out=$out ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    // optional: dump the two scoring plans (the pipeline link stage's
    // candidate+scoring subtree, old vs new shape) for the plans/
    // artifact — the SparkEntry-level explain can't show them because
    // linking runs eagerly inside the orchestration queries
    sys.env.get("LINKAB_PLANS").foreach { outDir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      def dump(name: String, df: DataFrame): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, name),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      val sets = shingled.select(col("entityId"), col("shingles"))
      val interN = graft.functions.SortedIntersectCount(
        col("sa.shingles"), col("sb.shingles")).cast("double")
      val uniN = (size(col("sa.shingles")) + size(col("sb.shingles")))
        .cast("double") - interN
      val candN = Linking.lshCandidates(shingled, cfg, n)
        .select(col("src"), col("dst"))
      dump("kg_pipeline_link_after.txt", candN
        .join(sets.as("sa").hint("SHUFFLE_HASH"),
          candN("src") === col("sa.entityId"))
        .join(sets.as("sb").hint("SHUFFLE_HASH"),
          candN("dst") === col("sb.entityId"))
        .select(col("src"), col("dst"), (interN / uniN).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct())
      val candO = candOld()
      val setsO = shingled
      dump("kg_pipeline_link_before.txt", candO
        .join(setsO.as("sa"), candO("src") === col("sa.entityId") &&
          candO("pred") === col("sa.pred"))
        .join(setsO.as("sb"), candO("dst") === col("sb.entityId") &&
          candO("pred") === col("sb.pred"))
        .select(col("src"), col("dst"), (interN / uniN).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct())
    }
    run("warmup(new)", () => scoreNew())
    (1 to reps).foreach { _ =>
      run("old(pred keys+rows)", () => scoreOld(candOld()))
      run("new(hash-folded)   ", () => scoreNew())
    }
    spark.stop()
  }
}
