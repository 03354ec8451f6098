package graft.tools

import graft.link.Linking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 same-JVM interleaved A/B: the narrowed scoring join
  * (entityId-only keys, (src,dst) candidate rows — what Linking ships
  * now) vs an inline replica of the round-7 scoring join (pred in both
  * join keys, (pred,src,dst) candidate rows). Both score the SAME
  * banded candidates over the SAME materialized shingle table, so the
  * delta is purely the exchange width / key comparison cost. Output
  * counts printed so equality is visible in the log.
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

    // round-7 scoring replica: pred rides candidates and both join keys
    def scoreOld(cand: DataFrame): DataFrame = {
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
        .select(col("src"), col("dst")).distinct()
    }
    // current scoring shape (mirrors Linking.scorePairs after r8)
    def scoreNew(cand: DataFrame): DataFrame = {
      val sets = shingled.select(col("entityId"), col("shingles"))
      val inter = graft.functions.SortedIntersectCount(
        col("sa.shingles"), col("sb.shingles")).cast("double")
      val uni = (size(col("sa.shingles")) + size(col("sb.shingles")))
        .cast("double") - inter
      val pairs = cand.select(col("src"), col("dst"))
      pairs
        .join(sets.as("sa"), pairs("src") === col("sa.entityId"))
        .join(sets.as("sb"), pairs("dst") === col("sb.entityId"))
        .select(col("src"), col("dst"), (inter / uni).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct()
    }
    def run(tag: String, f: DataFrame => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = f(Linking.lshCandidates(shingled, cfg, n)).count()
      println(f"[linkab] $tag out=$out ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    run("warmup(new)", scoreNew)
    (1 to reps).foreach { _ =>
      run("old(pred-keys) ", scoreOld)
      run("new(id-keys)   ", scoreNew)
    }
    spark.stop()
  }
}
