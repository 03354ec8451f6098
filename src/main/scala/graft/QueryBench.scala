package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries (args = names;
  * no args = all), N reps each (SPARK_GRAFT_REPS, default 3), printing
  * min/each — min-of-N because this host's wall clock has documented
  * 2–4× phase-shaped variance (BENCH.md §0). Same session config as
  * Bench so numbers are comparable.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-querybench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (sec, n)
      }
      val best = times.map(_._1).min
      println(f"QBENCH $name%-24s min=$best%8.3fs rows=${times.head._2}%8d " +
        times.map(t => f"${t._1}%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
