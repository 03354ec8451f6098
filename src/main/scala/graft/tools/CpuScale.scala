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

    // extraction-ONLY probe: pre-generate a small per-partition corpus
    // once, then loop the extractor registry over it `reps` times —
    // generation cost amortizes away, isolating the extract kernel's
    // scaling (the pipeline's data-proportional stage).
    val reps = sys.env.getOrElse("SPARK_GRAFT_KERNEL_REPS", "20").toInt
    val perPart = 2000
    val t1 = System.nanoTime()
    val triples2 = spark.range(0L, cpus.toLong * 4, 1L, cpus * 4).map { p =>
      val corpus = Array.tabulate(perPart)(j =>
        graft.fixtures.FilesGen.row(p * perPart + j, 42L, 8))
      val registry = graft.extract.ExtractorRegistry.all
      var total = 0L
      var r = 0
      while (r < reps) {
        var j = 0
        while (j < corpus.length) {
          val f = corpus(j)
          val ls = graft.extract.RuleExtractor.split(f.content)
          val it = registry.iterator
          while (it.hasNext) {
            val ex = it.next()
            if (ex.appliesTo(f.lang)) total += ex.extract(f, ls).size
          }
          j += 1
        }
        r += 1
      }
      total
    }.reduce(_ + _)
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"[cpuscale-kernel] cpus=$cpus files=${cpus * 4 * perPart * reps} " +
      f"triples=$triples2 wall=$sec2%.1fs rate=${triples2 / sec2}%.0f")
    spark.stop()
  }
}
