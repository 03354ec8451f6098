package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation-chain throughput at corpus scale: N documents-shaped rows
  * derived deterministically from the FilesGen corpus (text = file
  * content, stratum = language), materialized to parquet once
  * (generation is data prep, not pipeline cost), then
  * `Curation.curate` end-to-end, min-of-REPS.
  *
  * Scaling runs: execute at SPARK_GRAFT_CPUS=8 and =32 on the same
  * input (the corpus parquet is reused across invocations via
  * SPARK_GRAFT_CUR_DIR); efficiency = (rate32/rate8)/4.
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_CUR_DOCS", "1000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_CUR_REPS", "3").toInt
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_CUR_DIR",
      java.nio.file.Files.createTempDirectory("graft-curation").toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsPath = s"$baseDir/docs_$nDocs"
    if (!new java.io.File(docsPath, "_SUCCESS").exists()) {
      graft.fixtures.FilesGen.dataset(spark, nDocs, richness = 8)
        .select(
          xxhash64(col("repo"), col("path")).as("doc_id"),
          col("content").as("text"),
          col("lang").as("source"))
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)

    val walls = (1 to reps).map { rep =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // code corpora share template 3-grams corpus-wide (a 3-word
      // shingle flags ~98% of files against ANY held-out set) — the
      // standard decontamination unit for code is a long n-gram:
      // 8-word shingles, >=10 shared
      val out = graft.ops.Curation.curate(docs,
        benchFilter = pmod(col("doc_id"), lit(50)) === 0,
        rates = Map.empty, defaultRate = 0.5,
        splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        budget = 2048L, contamN = 8, contamMinOverlap = 10L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[curbench] rep$rep cpus=$cpus docs=$nDocs out=$out " +
        f"wall=$sec%.1fs rate=${nDocs / sec}%.0f docs/s")
      sec
    }
    println(f"[curbench] MIN cpus=$cpus docs=$nDocs wall=${walls.min}%.1fs " +
      f"rate=${nDocs / walls.min}%.0f docs/s")

    // SPARK_GRAFT_CUR_MEASURE_RUN=1: drive the SNAPSHOT path
    // (Curation.run) once and report per-stage write volume — the
    // round-6 no-text contract made cur_clean/cur_decon carry only
    // (id, stratum, n_tokens); this prints what that saves vs the
    // corpus-sized writes a text-carrying snapshot would pay.
    if (sys.env.get("SPARK_GRAFT_CUR_MEASURE_RUN").contains("1")) {
      val runDir = s"$baseDir/currun_$nDocs"
      graft.store.Snapshots.deleteDir(runDir)
      val t0 = System.nanoTime()
      graft.ops.Curation.run(spark, docs, runDir, "curbench",
        benchFilter = pmod(col("doc_id"), lit(50)) === 0,
        rates = Map.empty, defaultRate = 0.5,
        splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        budget = 2048L, contamN = 8, contamMinOverlap = 10L,
        resume = false).count()
      val wall = (System.nanoTime() - t0) / 1e9
      def bytes(p: String): Long = {
        val d = java.nio.file.Path.of(p)
        if (!java.nio.file.Files.exists(d)) return 0L
        val w = java.nio.file.Files.walk(d)
        try w.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
        finally w.close()
      }
      val corpus = bytes(docsPath)
      Seq("cur_clean", "cur_decon", "cur_packed").foreach { st =>
        val b = bytes(graft.store.Snapshots.stageDir(runDir, st))
        println(f"[curbench] run() stage=$st bytes=$b%,d " +
          f"(${b * 100.0 / corpus}%.2f%% of the ${corpus}%,d-byte corpus)")
      }
      println(f"[curbench] run() total wall=$wall%.1fs (snapshot path, 1 rep)")
    }
    spark.stop()
  }

  private implicit class It[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
