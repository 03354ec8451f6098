package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Sampling}

/** Dev probe: cumulative-stage timings of the curation chain, to
  * localize regressions (each timed frame re-runs its prefix).
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("curation-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"[probe] $name%-22s rep$i ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
      }
    }

    import org.apache.spark.sql.expressions.Window
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val byFp = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = corpus.withColumn("__rn", row_number().over(byFp))
      .filter(col("__rn") === 1).drop("__rn")
    time("dedup")(deduped)

    // ANTI-PATTERN stage, kept for the A/B: filtering on metrics that
    // reference a projected __ws alias lets predicate pushdown inline
    // split(text) into every lambda element access — O(words²)/row
    // (~7 s warm here vs ~0.5 s for the let-binding shape curate uses)
    def metricsOf(ws: org.apache.spark.sql.Column) = {
      val nW = size(ws)
      val topFrac = array_max(transform(array_distinct(ws),
        w => size(filter(ws, x => x === w)))).cast("double") / nW
      val dup2 = when(nW >= 2, lit(1.0) -
        size(array_distinct(transform(sequence(lit(1), nW - 1),
          i => concat(element_at(ws, i), lit(" "),
            element_at(ws, i + 1))))).cast("double") / (nW - 1))
        .otherwise(0.0)
      (topFrac, dup2)
    }
    val (nTopFrac, nDup2) = metricsOf(col("__ws"))
    time("repetition(NAIVE)")(deduped
      .withColumn("__ws", split(trim(col("text")), "\\s+"))
      .filter(nTopFrac <= 0.2 && nDup2 <= 0.9))
    val keepExpr = element_at(
      transform(array(split(trim(col("text")), "\\s+")), ws => {
        val (tf, d2) = metricsOf(ws); tf <= 0.2 && d2 <= 0.9
      }), 1)
    val clean = deduped.filter(keepExpr)
      .withColumn("__ws", split(trim(col("text")), "\\s+"))

    val flagged = Dedup.contaminated(clean, bench, n = 3, minOverlap = 5L)
      .select(col("doc_id"))
    time("flagged-only")(flagged)
    val decon = clean.join(flagged, Seq("doc_id"), "left_anti")
    time("+decontaminate")(decon)

    val sampled = Sampling.stratifiedSample(decon, col("doc_id"),
      col("source"), Map("src0" -> 0.3, "src1" -> 1.0), 0.5)
    val splitDf = Sampling.splitAssign(sampled, col("doc_id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    time("+sample+split")(splitDf)

    val toks = splitDf.select(col("doc_id"), col("source"), col("split"),
      size(col("__ws")).cast("long").as("n_tokens"))
    val packed = Sampling.packSequences(toks,
      struct(col("split"), col("source")), col("doc_id"),
      col("n_tokens"), 2048L)
    time("+pack (full)")(packed)

    time("curate()")(Curation.curate(docs, col("doc_id") % 50 === 0,
      Map("src0" -> 0.3, "src1" -> 1.0), 0.5,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), 2048L))
    spark.stop()
  }
}
