package graft.tools

import graft.ops.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the packSequences two-phase prefix sum: ONE group,
  * N rows (default 5M) — the exact shape where the old per-group
  * window collapsed to a single task. Verifies every offset against
  * the closed form (tokens = id%7 + 1 ⇒ start = 28·(id div 7) +
  * ((id%7)(id%7+1)) div 2), reports wall + the task count of the
  * packed pass. Run at SPARK_GRAFT_CPUS=8 and =32 for the scaling
  * pair.
  *
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.tools.PackBench [nRows]
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(rows: Long): (Double, Long, Int) = {
      val df = spark.range(0L, rows, 1L, cpus * 4)
        .select(col("id"), lit("g").as("grp"),
          (col("id") % 7 + 1).as("n_tokens"))
      val t0 = System.nanoTime()
      val out = Sampling.packSequences(df, col("grp"), col("id"),
        col("n_tokens"), 2048L)
      val bad = out.filter(col("start_tok") =!=
        expr("28 * (id div 7) + ((id % 7) * (id % 7 + 1)) div 2")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, bad, out.rdd.getNumPartitions)
    }

    once(100000L) // warmup (codegen + shuffle paths)
    val runs = (1 to reps).map(_ => once(n))
    runs.foreach { case (sec, bad, parts) =>
      require(bad == 0L, s"$bad offset mismatches")
      println(f"[packbench] cpus=$cpus rows=$n groups=1 parts=$parts " +
        f"wall=$sec%.2fs rate=${n / sec}%.0f rows/s offsetsOk=true")
    }
    val best = runs.map(_._1).min
    println(f"[packbench] BEST cpus=$cpus rows=$n wall=$best%.2fs " +
      f"rate=${n / best}%.0f rows/s")
    spark.stop()
  }
}
