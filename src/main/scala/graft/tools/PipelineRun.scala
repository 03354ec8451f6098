package graft.tools

import graft.Pipeline
import graft.fixtures.FilesGen
import org.apache.spark.sql.SparkSession

/** spark-submit surface of the KG pipeline (SURVEY.md §3.4 lifecycle).
  *
  * Usage: runMain graft.tools.PipelineRun <nFiles> <runDir> [runId]
  * Env:   SPARK_GRAFT_CPUS (local[N], default 8)
  *        SPARK_GRAFT_CC_LOCAL_THRESHOLD (edge count below which CC
  *        rides the driver union-find; 0 forces the DISTRIBUTED
  *        large/small-star fixpoint — the bench knob for exercising
  *        the 100 TB-only path at corpus sizes whose edge sets would
  *        otherwise fit the driver)
  *
  * Prints one summary line per run; re-running with the same runDir
  * resumes from the last published stage.
  */
object PipelineRun {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val runDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-run").toString)
    val runId = args.lift(2).getOrElse(s"run-$n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(s"$runDir/_checkpoints")

    // materialize the corpus as a parquet table first (the north-rule
    // input is an Iceberg-style table on storage, not a generator) —
    // corpus prep is not pipeline cost
    val richness = sys.env.getOrElse("SPARK_GRAFT_RICHNESS", "8").toInt
    // SPARK_GRAFT_FILES_DIR: share one materialized corpus across
    // repeated bench runs (corpus prep is excluded from timing anyway)
    val filesDir = sys.env.getOrElse("SPARK_GRAFT_FILES_DIR", s"$runDir/files")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(filesDir))) {
      FilesGen.dataset(spark, n, richness = richness)
        .write.mode("overwrite").parquet(filesDir)
    }
    import spark.implicits._
    val files = spark.read.parquet(filesDir).as[graft.SourceFile]

    val ccLocal = sys.env.get("SPARK_GRAFT_CC_LOCAL_THRESHOLD").map(_.toLong)
      .getOrElse(graft.canon.ConnectedComponents.LocalEdgeThreshold)
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, files, runDir, runId,
      Pipeline.Config(ccLocalThreshold = ccLocal))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[pipeline] runId=${res.runId} files=$n triples=${res.triples} " +
      f"quarantined=${res.quarantined} entities=${res.entities} " +
      f"linkEdges=${res.linkEdges} nodes=${res.nodes} edges=${res.edges} " +
      f"ccIters=${res.ccIterations} wall=${sec}%.1fs " +
      f"triplesPerSec=${res.triples / sec}%.0f runDir=$runDir")
    spark.stop()
  }
}
