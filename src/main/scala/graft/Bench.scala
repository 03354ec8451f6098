package graft

import org.apache.spark.sql.SparkSession

/** Round benchmark. Emits ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec",
  *    "queries":{<name>:<sec>,...},"failed":[...],"sf":"<dir>",
  *    "pipeline":{"files":N,"triples":T,"triplesPerSec":R,"cpus":C,
  *                "runsSec":[r1,r2],"stagesSec":{<stage>:<sec>,...}}}
  *
  * Delivery is belt-and-braces so the round driver can always parse it
  * (round 1 recorded parsed:null because the line reached the driver
  * wrapped in sbt's "[info] " prefix):
  *  - written to BENCH.json in the working directory (repo root under
  *    sbt; override with SPARK_GRAFT_BENCH_OUT), and
  *  - printed as the FINAL bare stdout line, after spark.stop(), with
  *    build.sbt routing forked-run stdout through unprefixed
  *    StdoutOutput and suppressing sbt's trailing [success] line.
  *
  * Two workloads, pipeline FIRST (provenance fixes from the round-3
  * verdict — the driver's r3 run measured the pipeline at 511s where
  * three builder runs of identical code+corpus+config measured
  * 45–98s, and the artifact couldn't say why):
  *  - the 4-stage KG pipeline on a generated bench corpus
  *    (SPARK_GRAFT_BENCH_FILES, default 200k files) — the north-rule
  *    throughput metric (triples/sec). It now runs BEFORE the query
  *    suite (a fresh JVM, not one carrying 46 queries of heap wake),
  *    min-of-N reps (SPARK_GRAFT_PIPE_REPS, default 2 — this host's
  *    wall clock has documented 2×+ phase-shaped noise), and the JSON
  *    carries the per-rep walls plus the PER-STAGE walls of the best
  *    rep (from the stage manifests' wallMs), so a pathological run is
  *    diagnosable from the artifact alone.
  *  - every SparkEntry query on SPARK_GRAFT_SF_DIR (relational + text +
  *    dedup + similarity surface), timed individually; a query that
  *    throws is recorded in "failed" (and its wall time kept) instead
  *    of silently passing as a timing entry.
  *
  * Scaling runs: execute this main at SPARK_GRAFT_CPUS=8 and =32 on
  * identical input; efficiency = (rate32/rate8)/4 (see BENCH.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchFiles = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILES", "200000").toLong
    val pipeReps = sys.env.getOrElse("SPARK_GRAFT_PIPE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plain FS checkpoint manager: the checksum manager's per-query
      // thread pools log "Thread pool did not terminate" ERRORs at
      // shutdown, polluting the stdout the driver parses
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- KG pipeline throughput, measured FIRST in a quiet JVM ----
    // over a materialized parquet corpus (the north-rule input is a
    // table on storage; generation is data prep, not pipeline cost)
    val baseDir = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val richness = sys.env.getOrElse("SPARK_GRAFT_RICHNESS", "8").toInt
    val filesDir = s"$baseDir/files"
    fixtures.FilesGen.dataset(spark, benchFiles, richness = richness)
      .write.mode("overwrite").parquet(filesDir)
    val files = spark.read.parquet(filesDir).as[SourceFile]

    // untimed warmup on a toy corpus: compiles every codegen path the
    // pipeline touches (extraction scanners, minhash_sigs, star joins,
    // parquet writers) so BOTH timed reps measure steady-state work
    // rather than rep 1 absorbing ~10s of janino compilation
    locally {
      val warmDir = s"$baseDir/warmup"
      spark.sparkContext.setCheckpointDir(s"$warmDir/_checkpoints")
      Pipeline.run(spark, fixtures.FilesGen.dataset(spark, 2000L, richness = richness),
        warmDir, "warmup", Pipeline.Config(resume = false,
          arrangePartitions = Some(4)))
      spark.catalog.clearCache()
      System.gc()
    }

    val reps = (1 to pipeReps).map { rep =>
      val runDir = s"$baseDir/run$rep"
      spark.sparkContext.setCheckpointDir(s"$runDir/_checkpoints")
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, files, runDir, s"bench$rep",
        Pipeline.Config(resume = false))
      val sec = (System.nanoTime() - t0) / 1e9
      // per-stage walls from the stage manifests (the diagnosis the
      // round-3 artifact lacked); the gap between their sum and the
      // rep wall is driver-side orchestration + host noise
      val stages = Pipeline.Stages.map(st =>
        st -> graft.store.Snapshots.readManifest(runDir, st).wallMs / 1e3)
      spark.catalog.clearCache()
      System.gc()
      (sec, res, stages)
    }
    val (pipeSec, res, stageWalls) = reps.minBy(_._1)
    val rate = res.triples / pipeSec

    // ---- query suite ----
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => failed += name; false }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop blocks persisted inside operators (dedup/LSH) so later
      // queries aren't measured under another query's memory pressure
      spark.catalog.clearCache()
      // a failed query's time-to-throw is NOT a timing: keeping it in
      // "queries"/total would deflate cross-round comparisons (the
      // failure itself is reported via "failed")
      if (ok) Some(name -> sec) else None
    }

    val allQ = results :+ ("kg_pipeline" -> pipeSec)
    val qs = allQ.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = allQ.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val runsJson = reps.map(_._1).mkString("[", ",", "]")
    val stagesJson = stageWalls.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val pipeline = s"""{"files":$benchFiles,"triples":${res.triples},""" +
      s""""triplesPerSec":${rate.toLong},"cpus":$cpus,""" +
      s""""runsSec":$runsJson,"stagesSec":$stagesJson}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"failed":$failedJson,"sf":"$sfDir","pipeline":$pipeline}"""

    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case _: Throwable => /* stdout below is the primary channel */ }

    // make sure nothing (executor cleanup, checkpoint managers) logs
    // after the metric line: stop everything first, print last
    spark.streams.active.foreach(_.stop())
    spark.stop()
    println(line)
    System.out.flush()
  }
}
