package graft.tools

import graft.link.Linking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B: scoring join over raw banded candidates
  * vs distinct-ed candidates (this host's cross-JVM phase noise
  * swamps a 20% effect; in-JVM alternation cancels it). Replicates
  * Linking.scorePairs inline (private there) — probe only.
  */
object ScoreAB {
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
    // materialize shingles once so both variants read the same parquet
    val dir = s"$runDir/_scratch/score_ab"
    val sh0 = Linking.withShingles(fuzzy, cfg.shingleSize)
      .select(col("pred"), col("entityId"), col("shingles"))
    sh0.write.mode("overwrite").parquet(dir)
    val shingled = spark.read.parquet(dir)

    def score(cand: DataFrame): DataFrame = {
      val sets = shingled
      val inter = size(array_intersect(col("sa.shingles"), col("sb.shingles"))).cast("double")
      val uni = (size(col("sa.shingles")) + size(col("sb.shingles"))).cast("double") - inter
      // r8: candidates no longer carry pred (folded into the band
      // key); scoring joins on entityId alone, mirroring Linking
      cand
        .join(sets.as("sa"), cand("src") === col("sa.entityId"))
        .join(sets.as("sb"), cand("dst") === col("sb.entityId"))
        .select(col("src"), col("dst"), (inter / uni).as("j"))
        .filter(col("j") >= cfg.threshold)
        .select(col("src"), col("dst")).distinct()
    }
    def run(tag: String, pre: Boolean): Unit = {
      val t0 = System.nanoTime()
      val cand0 = Linking.lshCandidates(shingled, cfg, n)
      val cand = if (pre) cand0.distinct() else cand0
      val out = score(cand).count()
      println(f"[ab] $tag out=$out ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    run("warmup(raw)", pre = false)
    (1 to reps).foreach { _ =>
      run("raw     ", pre = false)
      run("distinct", pre = true)
    }
    spark.stop()
  }
}
