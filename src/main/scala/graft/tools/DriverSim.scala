package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only driver simulator: exercises the exact surface the round
  * driver uses — SparkEntry.entry (smoke, rows>0) and every
  * SparkEntry.queries entry — and prints row counts.
  *
  * Usage: runMain graft.tools.DriverSim [sfDir]
  */
object DriverSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-driversim")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entryRows = graft.SparkEntry.entry(spark).count()
    println(s"[driversim] entry rows=$entryRows ${if (entryRows > 0) "OK" else "FAIL"}")

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        val oracle = if (graft.SparkEntry.oracleSql.contains(name)) "oracle" else "rows-only"
        println(f"[driversim] $name%-28s rows=$n%-8d ${s}%.2fs [$oracle]")
      } catch {
        case e: Throwable =>
          println(s"[driversim] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
