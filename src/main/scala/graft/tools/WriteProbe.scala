package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B the extract-stage write cost (the pipeline's dominant
  * non-kernel cost): partitionBy-vs-not, with/without the derivable
  * subj column, compression codecs.
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.tools.WriteProbe <corpusDir>
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/dev/shm/gr/corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val files = spark.read.parquet(corpus).as[graft.SourceFile]
    val out = "/dev/shm/gr/wprobe"
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[wprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val triples = graft.extract.Extraction.extract(files).toDF()
    t("extract+count only") { triples.count() }
    t("write partBy(pred)") {
      triples.write.mode("overwrite").partitionBy("pred").parquet(s"$out/a")
    }
    t("write flat") {
      triples.write.mode("overwrite").parquet(s"$out/b")
    }
    t("write flat no-subj") {
      triples.drop("subj").write.mode("overwrite").parquet(s"$out/c")
    }
    t("write partBy no-subj") {
      triples.drop("subj").write.mode("overwrite").partitionBy("pred").parquet(s"$out/d")
    }
    t("write partBy no-subj lz4") {
      triples.drop("subj").write.mode("overwrite").option("compression", "lz4")
        .partitionBy("pred").parquet(s"$out/e")
    }
    t("write partByBool no-subj lz4") {
      triples.drop("subj")
        .withColumn("q", col("pred") === "__quarantine__")
        .write.mode("overwrite").option("compression", "lz4")
        .partitionBy("q").parquet(s"$out/f")
    }
    t("read e filter pred count") {
      spark.read.parquet(s"$out/e")
        .filter(col("pred") =!= "__quarantine__").count()
    }
    t("read f filter pred count") {
      spark.read.parquet(s"$out/f").filter(!col("q")).count()
    }
    Seq("a","b","c","d","e","f").foreach { s =>
      val sz = graft.store.Snapshots.footerCounts(s"$out/$s").size
      val bytes = {
        val p = java.nio.file.Paths.get(s"$out/$s")
        val w = java.nio.file.Files.walk(p)
        try w.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
        finally w.close()
      }
      println(f"[wprobe] dir=$s files=$sz bytes=${bytes / 1048576}%dMB")
    }
    spark.stop()
  }
  private implicit class I[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
