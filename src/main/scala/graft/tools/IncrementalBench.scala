package graft.tools

import graft.Pipeline
import graft.fixtures.FilesGen
import org.apache.spark.sql.SparkSession

/** Incremental-ingest cost at bench scale: full run over N files,
  * then `Pipeline.runIncremental` of an M-file delta into the same
  * run dir, vs a from-scratch run over N+M — reporting all three
  * walls and the count equality of the incremental and from-scratch
  * graphs. The claim under test: ingest cost ≈ extract(delta) +
  * relink(narrow tables), NOT extract(corpus).
  *
  * Usage: runMain graft.tools.IncrementalBench [N] [M]
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val m = args.lift(1).map(_.toLong).getOrElse(n / 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-inc-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val richness = sys.env.getOrElse("SPARK_GRAFT_RICHNESS", "8").toInt
    // corpora materialized first (table-on-storage input; prep untimed)
    def mat(tag: String, start: Long, count: Long): String = {
      val dir = s"$base/files_$tag"
      FilesGen.dataset(spark, count, richness = richness, start = start)
        .write.mode("overwrite").parquet(dir)
      dir
    }
    val baseDir = mat("base", 0L, n)
    val deltaDir = mat("delta", n, m)
    val fullDir = mat("full", 0L, n + m)
    def rd(dir: String) = spark.read.parquet(dir).as[graft.SourceFile]

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[incbench] $tag wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    spark.sparkContext.setCheckpointDir(s"$base/_checkpoints")
    timed(s"base run n=$n")(
      Pipeline.run(spark, rd(baseDir), s"$base/inc", "base"))

    // ---- EPOCH-PINNED ingest, from a copy of the pre-ingest state ----
    // (so pinned and global ingest both start from the identical base)
    val incp = s"$base/incp"
    copyDir(s"$base/inc", incp)
    timed("pinEpoch")(Pipeline.pinEpoch(spark, incp, "pin"))
    val rPin = timed(s"EPOCH-PINNED ingest m=$m")(
      Pipeline.runIncrementalPinned(spark, rd(deltaDir), incp, "delta"))

    val rInc = timed(s"global incremental ingest m=$m")(
      Pipeline.runIncremental(spark, rd(deltaDir), s"$base/inc", "delta"))
    val rFull = timed(s"from-scratch n+m=${n + m}")(
      Pipeline.run(spark, rd(fullDir), s"$base/full", "full"))
    val eq = rInc.copy(runId = "x") == rFull.copy(runId = "x")
    println(s"[incbench] counts incremental==fromScratch: $eq " +
      s"(nodes=${rInc.nodes}, edges=${rInc.edges}, triples=${rInc.triples})")
    // the claim decomposed: the ingest's extract wall covers ONLY the
    // delta; everything else is the narrow-table relink
    import graft.store.Snapshots
    val exBase = Snapshots.readManifestVersion(s"$base/inc", "extract", 1)
    val exDelta = Snapshots.readManifestVersion(s"$base/inc", "extract", 2)
    val exFull = Snapshots.readManifest(s"$base/full", "extract")
    println(f"[incbench] extract walls: base(n)=${exBase.wallMs / 1e3}%.1fs " +
      f"delta(m)=${exDelta.wallMs / 1e3}%.1fs fromScratch(n+m)=${exFull.wallMs / 1e3}%.1fs")

    // the epoch claim decomposed: the pinned ingest's LINKING work is
    // delta-sized (entities/shingles/keys/link_edges appends) where
    // the global ingest recomputes full-corpus entities + link_edges
    def w(dir: String, stage: String, v: Int): Double =
      Snapshots.readManifestVersion(dir, stage, v).wallMs / 1e3
    println(f"[incbench] global ingest link walls: " +
      f"entities=${w(s"$base/inc", "entities", 2)}%.1fs " +
      f"link_edges=${w(s"$base/inc", "link_edges", 2)}%.1fs")
    println(f"[incbench] pinned ingest link walls: " +
      f"entities=${w(incp, "entities", 2)}%.1fs " +
      f"ep_shingles=${w(incp, "ep_shingles", 2)}%.1fs " +
      f"ep_keys=${w(incp, "ep_keys", 2)}%.1fs " +
      f"link_edges=${w(incp, "link_edges", 2)}%.1fs")
    println(s"[incbench] pinned-vs-global graph: nodes ${rPin.nodes}/" +
      s"${rInc.nodes} edges ${rPin.edges}/${rInc.edges} " +
      s"(pinned census vs fresh census — equality is only promised " +
      s"census-for-census, PipelineSpec)")
    spark.stop()
    graft.store.Snapshots.deleteDir(base)
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Path.of(from)
    val walk = java.nio.file.Files.walk(src)
    try {
      val it = walk.iterator()
      while (it.hasNext) {
        val p = it.next()
        val dst = java.nio.file.Path.of(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    } finally walk.close()
  }
}
