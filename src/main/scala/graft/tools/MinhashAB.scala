package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 same-JVM interleaved A/B for minhashNearDupPairs: the
  * round-7 shape (bandKeys groupBy + separate collect_set groupBy —
  * two wordShingles passes) vs the combined per-doc aggregation, with
  * and without scratch materialization.
  * Usage: runMain graft.tools.MinhashAB [sfDir] [reps]
  */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (n, minJ, numBands, seed, id, text) =
      (3, 0.5, 8, 42L, "doc_id", "text")

    // round-7 replica: separate band-key and set aggregations
    def old(): Long = {
      val cand = graft.ops.Dedup
        .minhashBandCandidates(docs, n, numBands, seed, id, text)
      val sets = graft.ops.Dedup.wordShingles(docs, n, id, text)
        .groupBy(col(id)).agg(collect_set(col("shingle")).as("sh"))
      val inter = size(array_intersect(col("a.sh"), col("b.sh")))
        .cast("double")
      val uni = (size(col("a.sh")) + size(col("b.sh"))).cast("double") - inter
      cand
        .join(sets.as("a"), cand("id_a") === col(s"a.$id"))
        .join(sets.as("b"), cand("id_b") === col(s"b.$id"))
        .select(col("id_a"), col("id_b"), (inter / uni).as("j_raw"))
        .filter(col("j_raw") >= minJ)
        .select(col("id_a"), col("id_b"),
          round(col("j_raw"), 6).as("jaccard")).count()
    }
    // combined per-doc aggregation (band keys + collect_set in one
    // groupBy), optionally scratch-materialized — the round-8 candidate
    // restructure; MEASURED NOT BETTER than the shipped two-pass shape
    // at sf0.1 (scratch write dominates; no-scratch is a wash), so it
    // lives only here as the A/B record
    def combined(scratch: Option[String]): Long = {
      val sh = graft.ops.Dedup.wordShingles(docs, n, id, text)
      val aggs = (0 until numBands).map(i =>
        min(xxhash64(lit(seed + i), col("shingle"))).as(s"k$i")) :+
        collect_set(col("shingle")).as("sh")
      val perDoc0 = sh.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
      val perDoc = scratch match {
        case Some(d) =>
          val p = s"$d/minhash-${java.util.UUID.randomUUID()}"
          perDoc0.write.mode("overwrite").parquet(p)
          spark.read.parquet(p)
        case None => perDoc0
      }
      val banded = perDoc.select(col(id),
          explode(array((0 until numBands).map(i =>
            struct(lit(i).as("band"), col(s"k$i").as("key"))): _*)).as("bk"))
        .select(col(id), col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = banded.as("a").join(banded.as("b"), Seq("band", "key"))
        .filter(col(s"a.$id") < col(s"b.$id"))
        .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
        .distinct()
      val sets = perDoc.select(col(id), col("sh"))
      val inter = size(array_intersect(col("a.sh"), col("b.sh")))
        .cast("double")
      val uni = (size(col("a.sh")) + size(col("b.sh"))).cast("double") - inter
      cand
        .join(sets.as("a"), cand("id_a") === col(s"a.$id"))
        .join(sets.as("b"), cand("id_b") === col(s"b.$id"))
        .select(col("id_a"), col("id_b"), (inter / uni).as("j_raw"))
        .filter(col("j_raw") >= minJ)
        .select(col("id_a"), col("id_b"),
          round(col("j_raw"), 6).as("jaccard")).count()
    }

    def run(tag: String, f: () => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f()
      spark.catalog.clearCache()
      println(f"[mhab] $tag out=$out ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val sdir = java.nio.file.Files.createTempDirectory("mhab").toString
    run("warmup(comb+scratch)", () => combined(Some(sdir)))
    run("warmup(old)         ", () => old())
    (1 to reps).foreach { _ =>
      run("old(two-pass)      ", () => old())
      run("comb+scratch       ", () => combined(Some(sdir)))
      run("comb no-scratch    ", () => combined(None))
    }
    graft.store.Snapshots.deleteDir(sdir)
    spark.stop()
  }
}
