package graft.tools

import graft.link.Linking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stage hot spots (dev only): times the fuzzy
  * linking path over a materialized run dir through the PUBLIC
  * Linking API (no mirror of internals — mirrors rot).
  */
object Profile {
  def time[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val runDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = Linking.Config()
    val ents = graft.store.Snapshots.read(spark, runDir, "entities")
    val n = time("entities count")(ents.count())
    val fuzzy = ents.filter(col("pred").isin(Linking.FuzzyPreds: _*))
    val nf = time("fuzzy count")(fuzzy.count())
    println(s"[profile] entities=$n fuzzy=$nf cap=${cfg.stopShingleCap(n)}")

    // candidate volume + per-phase wall through the debug surface
    val shingled = Linking.withShingles(fuzzy, cfg.shingleSize)
    val candN = time("candidates only (groupBy expand)")(
      Linking.lshCandidates(shingled, cfg, n).count())
    println(s"[profile] banded candidates=$candN")
    time("candidates again (warm)")(
      Linking.lshCandidates(shingled, cfg, n).count())
    val withDist = time("lshEdgesWithDist full")(
      Linking.lshEdges2Debug(fuzzy, cfg).count())
    println(s"[profile] scored fuzzy pairs=$withDist")
    time("exact-norm + fuzzy linkEdges")(
      Linking.linkEdges(ents, cfg, Some(true), Some(n)).count())
    time("linkEdges again (plan warm)")(
      Linking.linkEdges(ents, cfg, Some(true), Some(n)).count())
    spark.stop()
  }
}
