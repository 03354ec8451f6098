package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time the kg_pipeline_nodes query exactly as the bench
  * session runs it (local[N], shuffle.partitions=N, AQE on), then dump
  * per-stage wallMs from the stage manifests.
  *
  * Usage: runMain graft.tools.KgqBench [n] [cpus]
  */
object KgqBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000L)
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kgqbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm codegen/IO the way Bench's earlier queries would
    spark.range(1000000L).selectExpr("sum(id)").collect()

    sys.env.get("KGQ_SHUFFLE").foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v))
    sys.env.get("KGQ_PARFIRST").foreach(v =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", v))
    sys.env.get("KGQ_WSCG").foreach(v =>
      spark.conf.set("spark.sql.codegen.wholeStage", v))
    val t0 = System.nanoTime()
    // inline twin of the SparkEntry.kg_pipeline_nodes body, with n a param
    val runDir = java.nio.file.Files.createTempDirectory("graft-kgq").toString
    spark.sparkContext.setCheckpointDir(s"$runDir/_ck")
    if (sys.env.contains("KGQ_MICRO")) {
      import spark.implicits._
      Profile.time("plain range write")(
        spark.range(2000).write.mode("overwrite").parquet(s"$runDir/m0"))
      Profile.time("filesgen count")(
        graft.fixtures.FilesGen.dataset(spark, n).count())
      Profile.time("filesgen write")(
        graft.fixtures.FilesGen.dataset(spark, n)
          .write.mode("overwrite").parquet(s"$runDir/m1"))
      val files = graft.fixtures.FilesGen.dataset(spark, n)
      Profile.time("rangepart write")(
        files.repartitionByRange(spark.sparkContext.defaultParallelism,
          $"repo", $"path").write.mode("overwrite").parquet(s"$runDir/m2"))
      Profile.time("extract write")(
        graft.extract.Extraction.extract(
          files.repartitionByRange(spark.sparkContext.defaultParallelism,
            $"repo", $"path")).toDF()
          .write.mode("overwrite").partitionBy("pred").parquet(s"$runDir/m3"))
      Profile.time("extract write 2nd")(
        graft.extract.Extraction.extract(
          files.repartitionByRange(spark.sparkContext.defaultParallelism,
            $"repo", $"path")).toDF()
          .write.mode("overwrite").partitionBy("pred").parquet(s"$runDir/m4"))
      Profile.time("footers")(graft.store.Snapshots.footerCounts(s"$runDir/m3"))
      spark.stop(); graft.store.Snapshots.deleteDir(runDir); return
    }
    if (sys.env.contains("KGQ_PHASES")) {
      import graft.link.Linking
      import graft.store.Snapshots
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val files = graft.fixtures.FilesGen.dataset(spark, n)
      val raw = Profile.time("extract")(Snapshots.stage(spark, runDir, "extract", "kgq", resume = false,
        partitionBy = Seq("pred")) {
        val arranged = files.repartitionByRange(4, $"repo", $"path")
        graft.extract.Extraction.extract(arranged).toDF()
      })
      val triples = raw.filter($"pred" =!= "__quarantine__")
      val ents = Profile.time("entities")(Snapshots.stage(spark, runDir, "entities", "kgq", resume = false) {
        Linking.entities(triples.as[graft.Triple])
      })
      val links = Profile.time("link_edges")(Snapshots.stage(spark, runDir, "link_edges", "kgq", resume = false) {
        Linking.linkEdges(ents, Linking.Config(), Some(true),
          sizeHint = Some(Snapshots.readManifest(runDir, "entities").rows))
      })
      val assign = Profile.time("assign")(Snapshots.stage(spark, runDir, "assign", "kgq", resume = false) {
        graft.Pipeline.assignCanonical(ents, links, 100000L)._1
      })
      Profile.time("nodes")(Snapshots.stage(spark, runDir, "nodes", "kgq", resume = false,
        partitionBy = Seq("kind")) {
        assign.groupBy("canonicalId")
          .agg(min(struct($"norm", $"obj")).as("m"), min($"pred").as("kind"),
            count(lit(1)).as("memberCount"))
          .select($"canonicalId", $"m.obj".as("canonical"), $"kind", $"memberCount")
      })
      Profile.time("edges")(Snapshots.stage(spark, runDir, "edges", "kgq", resume = false,
        partitionBy = Seq("pred")) {
        val withId = triples.withColumn("entityId", Linking.idCol($"pred", $"obj"))
        graft.link.SkewJoin.joinUniqueRight(
            withId, assign.select($"entityId", $"canonicalId"),
            "entityId", 100000L,
            leftCountHint = Some(Snapshots.readManifest(runDir, "extract").rows))
          .select($"subj", $"pred", $"canonicalId", $"conf", $"repo", $"path", $"commit")
      })
    } else {
      graft.Pipeline.run(spark, graft.fixtures.FilesGen.dataset(spark, n),
        runDir, "kgq",
        graft.Pipeline.Config(resume = false, arrangePartitions = Some(4)))
    }
    val rows = graft.store.Snapshots.read(spark, runDir, "nodes")
      .select("canonical", "kind", "memberCount").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[kgq] n=$n cpus=$cpus rows=$rows total=${sec}%.2fs")
    spark.stop()
    graft.store.Snapshots.deleteDir(runDir)
  }
}
