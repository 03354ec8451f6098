package graft.tools

import graft.Pipeline
import graft.fixtures.FilesGen
import graft.link.Linking
import graft.store.Snapshots
import org.apache.spark.sql.SparkSession

/** Census drift over a LONG-LIVED epoch: base run + pin, then K
  * chained pinned ingests WITHOUT re-pinning, printing each ingest's
  * censusDrift manifest metric — the operable signal behind
  * Pipeline.Config.maxCensusDrift. The census cap is pinned LOW
  * (maxShingleDf, frac ≈ 0) so document frequencies keep crossing it
  * as the corpus grows — the exact staleness mode a frozen census
  * hides: drift must rise monotonically-ish with ingests, and a
  * maxCensusDrift bound set between ingest-1 and ingest-K drift
  * levels refuses exactly the later ingests.
  *
  * Arg 5 (driftSample, default 1.0) prices the drift metric itself:
  * the exact metric scans the stored shingle lineage once per ingest;
  * driftSample < 1 trades that scan for a sampled estimate — running
  * the same chain at 1.0 and at e.g. 0.1 shows the cost (driftSec)
  * and the estimate error side by side.
  *
  * Usage: runMain graft.tools.DriftBench [n] [m] [k] [maxShingleDf] [driftSample]
  *   defaults: 50000 5000 3 50 1.0
  */
object DriftBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val m = args.lift(1).map(_.toLong).getOrElse(5000L)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val cap = args.lift(3).map(_.toLong).getOrElse(50L)
    val dSample = args.lift(4).map(_.toDouble).getOrElse(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-drift-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-drift").toString
    spark.sparkContext.setCheckpointDir(s"$root/_checkpoints")
    val cfg = Pipeline.Config(
      link = Linking.Config(maxShingleDf = cap, maxShingleDfFrac = 1e-12),
      canonBuckets = Some(512), driftSample = dSample)
    def rd(dir: String) = spark.read.parquet(dir).as[graft.SourceFile]
    def mat(tag: String, start: Long, count: Long): String = {
      val dir = s"$root/files_$tag"
      FilesGen.dataset(spark, count, start = start)
        .write.mode("overwrite").parquet(dir)
      dir
    }
    val run = s"$root/run"
    Pipeline.run(spark, rd(mat("base", 0L, n)), run, "base", cfg)
    Pipeline.pinEpoch(spark, run, "pin", cfg)
    (1 to k).foreach { i =>
      val d = mat(s"d$i", n + (i - 1) * m, m)
      val t0 = System.nanoTime()
      Pipeline.runIncrementalPinned(spark, rd(d), run, s"delta$i", cfg)
      val wall = (System.nanoTime() - t0) / 1e9
      val keysV = Snapshots.versions(run, "ep_keys").last
      val metrics = Snapshots.readManifestVersion(run, "ep_keys", keysV)
        .metrics
      println(f"[driftbench] n=$n m=$m cap=$cap sample=$dSample ingest=$i " +
        f"wall=$wall%5.1fs censusDrift=${metrics("censusDrift")} " +
        f"driftSec=${metrics("driftSec")}")
    }
    spark.stop()
    graft.store.Snapshots.deleteDir(root)
  }
}
