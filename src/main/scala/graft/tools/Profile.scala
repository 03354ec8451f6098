package graft.tools

import graft.link.Linking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stage hot spots (dev only). Dissects the fuzzy
  * linking path over a materialized run dir: where do the link_edges
  * seconds go, and how many candidate pairs does banding surface.
  */
object Profile {
  def time[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val runDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = Linking.Config()
    val ents = graft.store.Snapshots.read(spark, runDir, "entities")
    val n = time("entities count")(ents.count())
    val fuzzy = ents.filter(col("pred").isin(Linking.FuzzyPreds: _*))
    val nf = time("fuzzy count")(fuzzy.count())
    println(s"[profile] entities=$n fuzzy=$nf cap=${cfg.stopShingleCap(n)}")

    // mirror of Linking internals (kept in sync by hand; dev only)
    val k = cfg.shingleSize
    val shingled = fuzzy.withColumn("padded",
        when(length(col("norm")) < k, rpad(col("norm"), k, "_"))
          .otherwise(col("norm")))
      .withColumn("shingles", array_distinct(
        expr(s"transform(sequence(0, length(padded) - $k), i -> substring(padded, i + 1, $k))")))
      .drop("padded")
    val ex = shingled.select(col("pred"), col("entityId"),
      explode(col("shingles")).as("sh"))
    time("shingle rows")(println("[profile]   rows=" + ex.count()))
    val df = ex.groupBy("pred", "sh").agg(count(lit(1)).as("df"))
    val cap = cfg.stopShingleCap(n)
    time("df agg / hot shingles")(println("[profile]   distinct=" +
      df.count() + " hot=" + df.filter(col("df") > cap).count()))
    val kept = ex.join(broadcast(df.filter(col("df") > cap)
      .select("pred", "sh")), Seq("pred", "sh"), "left_anti")
    val nHashes = cfg.bands * cfg.rowsPerBand
    val aggs = (0 until nHashes).map(i =>
      min(xxhash64(lit(cfg.seed + i), col("sh"))).as(s"k$i"))
    val keys = kept.groupBy(col("pred"), col("entityId"))
      .agg(aggs.head, aggs.tail: _*)
    val bandStructs = (0 until cfg.bands).map { b =>
      struct(lit(b).as("band"),
        struct((0 until cfg.rowsPerBand).map(r =>
          col(s"k${b * cfg.rowsPerBand + r}").as(s"h$r")): _*).as("key"))
    }
    val banded = keys.select(col("pred"), col("entityId"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("pred"), col("entityId"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .persist()
    time("banded rows")(println("[profile]   rows=" + banded.count()))
    val cand = banded.as("a").join(banded.as("b"), Seq("pred", "band", "key"))
      .filter(col("a.entityId") < col("b.entityId"))
      .select(col("pred"), col("a.entityId").as("src"),
        col("b.entityId").as("dst"))
    val candRaw = time("candidate join (pre-distinct)")(cand.count())
    val candDedup = time("candidate distinct")(cand.distinct().count())
    println(s"[profile] candidates raw=$candRaw distinct=$candDedup")
    banded.unpersist()
    val t0 = System.nanoTime()
    val edges = Linking.linkEdges(ents, cfg, Some(true), Some(n)).count()
    println(f"[profile] full linkEdges=$edges in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
