package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 same-JVM interleaved A/B for ngramJaccardPairs: the shipped
  * 2-exchange grouped-expansion shape vs an inline replica of the
  * round-7 persist + census-join + self-join + sizes-joins shape.
  * Usage: runMain graft.tools.NgramAB [sfDir] [reps]
  */
object NgramAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (n, minJ, cap, id, text) = (3, 0.5, 1000L, "doc_id", "text")

    def old(): Long = {
      val sh = graft.ops.Dedup.wordShingles(docs, n, id, text).persist()
      try {
        val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
        val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("shingle")
        val blocked = sh.join(rare, Seq("shingle"))
        val pairs = blocked.as("a")
          .join(blocked.as("b"), Seq("shingle"))
          .filter(col(s"a.$id") < col(s"b.$id"))
          .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .join(sizes.withColumnRenamed(id, "id_a")
            .withColumnRenamed("sz", "sz_a"), "id_a")
          .join(sizes.withColumnRenamed(id, "id_b")
            .withColumnRenamed("sz", "sz_b"), "id_b")
          .withColumn("jaccard", round(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")), 6))
          .filter(col("jaccard") >= minJ)
          .select("id_a", "id_b", "jaccard").count()
      } finally { sh.unpersist(); (): Unit }
    }
    def neu(): Long =
      graft.ops.Dedup.ngramJaccardPairs(docs, n, minJ, cap, id, text).count()

    def run(tag: String, f: () => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f()
      spark.catalog.clearCache()
      println(f"[ngramab] $tag out=$out ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    run("warmup(new)", () => neu())
    run("warmup(old)", () => old())
    (1 to reps).foreach { _ =>
      run("old(persist+joins)", () => old())
      run("new(2-exchange)   ", () => neu())
    }
    spark.stop()
  }
}
