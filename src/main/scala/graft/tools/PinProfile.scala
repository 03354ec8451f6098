package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: per-phase wall breakdown of the kg_nodes_pinned query
  * body (the suite's most expensive single entry) under the exact
  * bench session shape, plus Spark job/stage counts per phase — the
  * query is orchestration-bound even at sf0.001, so the lever is
  * fixed per-action cost, and this names which actions.
  *
  * Usage: runMain graft.tools.PinProfile [sfDir] [cpus] [canonBuckets]
  */
object PinProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = args.lift(1).getOrElse("32")
    val buckets = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pinprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val verbose = sys.env.contains("PIN_JOBS")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobStart.put(j.jobId, (System.nanoTime(), site))
          (): Unit
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (verbose && s != null)
            println(f"[job] #${j.jobId}%-4d ${(System.nanoTime() - s._1) / 1e9}%6.2fs  ${s._2}")
          (): Unit
        }
      })
    def phase[T](tag: String)(body: => T): T = {
      val j0 = jobs.get()
      graft.store.IOStat.reset()
      val r = Profile.time(tag)(body)
      println(s"[profile]   jobs for $tag: ${jobs.get() - j0}  " +
        s"iostat: ${graft.store.IOStat.report()}")
      r
    }

    // warm codegen/IO the way the suite's earlier queries would
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(table: String): DataFrame =
      spark.read.parquet(s"$dir/$table.parquet")

    // inline twin of SparkEntry.asksCorpus (private there)
    val words = graft.ops.TextOps.distinctWords(t("documents"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val forms = words.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, upper(col("word")))
        .when(col("doc_id") % 3 === 1, concat(col("word"), lit(".")))
        .otherwise(col("word")).as("form"))
    val filesDf = forms.groupBy(col("doc_id"))
      .agg(concat_ws("\n", sort_array(collect_list(
        concat(lit("q: "), col("form"), lit("?"))))).as("content"))
      .select(lit("docs").as("repo"),
        concat(lit("d"), col("doc_id").cast("string"), lit(".txt"))
          .as("path"),
        lit("c0").as("commit"), lit("md").as("lang"), col("content"),
        col("doc_id"))

    val cfg = graft.Pipeline.Config(resume = false,
      arrangePartitions = Some(4), canonBuckets = Some(buckets))

    // rep 1 pays fresh-JVM codegen; the suite runs this query warm —
    // rep 2 is the number that matters
    for (rep <- 1 to 2) {
      val runDir = java.nio.file.Files
        .createTempDirectory(s"graft-pinprof$rep").toString
      spark.sparkContext.setCheckpointDir(s"$runDir/_ck")
      val t0 = System.nanoTime()
      phase(s"r$rep corpus materialize (count)")(filesDf.count())
      phase(s"r$rep Pipeline.run (base half)")(
        graft.Pipeline.run(spark,
          filesDf.filter(col("doc_id") % 2 === 0).drop("doc_id")
            .as[graft.SourceFile], runDir, "pin-base", cfg))
      phase(s"r$rep pinEpoch")(
        graft.Pipeline.pinEpoch(spark, runDir, "pin-pin", cfg))
      phase(s"r$rep runIncrementalPinned (delta half)")(
        graft.Pipeline.runIncrementalPinned(spark,
          filesDf.filter(col("doc_id") % 2 =!= 0).drop("doc_id")
            .as[graft.SourceFile], runDir, "pin-delta", cfg))
      val rows = phase(s"r$rep read nodes")(
        graft.store.Snapshots.read(spark, runDir, "nodes")
          .filter(col("kind") === "asks").count())
      for (st <- Seq("extract", "entities", "link_edges", "assign",
        "nodes", "edges", "ep_shingles", "ep_census", "ep_keys")) {
        val walls = graft.store.Snapshots.versions(runDir, st).map { v =>
          val m = graft.store.Snapshots.readManifestVersion(runDir, st, v)
          f"v$v=${m.wallMs / 1000.0}%.2fs(${m.runId})"
        }
        println(s"[stagewall] $st ${walls.mkString(" ")}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pinprofile] rep=$rep dir=$dir cpus=$cpus " +
        f"buckets=$buckets rows=$rows totalJobs=${jobs.get()} " +
        f"total=${sec}%.2fs")
      graft.store.Snapshots.deleteDir(runDir)
    }
    spark.stop()
  }
}
