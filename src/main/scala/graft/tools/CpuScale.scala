package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: pure-CPU scaling probe — generate rows and run the full
  * extractor registry inside tasks, no input/output IO at all.
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.tools.CpuScale [nFiles]
  */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // warmup (JIT)
    spark.range(0L, 20000L, 1L, cpus).map { i =>
      val f = graft.fixtures.FilesGen.row(i, 42L, 8)
      graft.extract.ExtractorRegistry.all.iterator
        .filter(_.appliesTo(f.lang)).map(_.extract(f).size).sum.toLong
    }.reduce(_ + _)
    val t0 = System.nanoTime()
    val triples = spark.range(0L, n, 1L, cpus * 4).map { i =>
      val f = graft.fixtures.FilesGen.row(i, 42L, 8)
      graft.extract.ExtractorRegistry.all.iterator
        .filter(_.appliesTo(f.lang)).map(_.extract(f).size).sum.toLong
    }.reduce(_ + _)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[cpuscale] cpus=$cpus files=$n triples=$triples wall=$sec%.1fs rate=${triples / sec}%.0f")
    spark.stop()
  }
}
