package graft.tools

import graft.Triple
import graft.link.Linking
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stage hot spots (dev only). */
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
    import spark.implicits._

    val raw = graft.store.Snapshots.read(spark, runDir, "extract")
    val triples = raw.filter($"pred" =!= "__quarantine__")
    time("raw.count")(raw.count())
    time("triples select distinct count")(
      triples.select("pred", "obj").distinct().count())
    time("entities full")(Linking.entities(triples.as[Triple]).count())
    val ents = Linking.entities(triples.as[Triple])
    time("entities write")(
      ents.write.mode("overwrite").parquet("/tmp/profile-ents"))
    time("entities as DF no typed")(
      triples.select($"pred", $"obj").distinct()
        .withColumn("norm", Linking.normCol($"obj"))
        .withColumn("entityId", Linking.idCol($"pred", $"obj")).count())

    val links = graft.store.Snapshots.read(spark, runDir, "link_edges")
    val cc = time("cc.run")(graft.canon.ConnectedComponents.run(links))
    time("cc assignments count")(cc.assignments.count())
    val ents2 = graft.store.Snapshots.read(spark, runDir, "entities")
    time("assign join")({
      val a = ents2.join(cc.assignments.withColumnRenamed("id", "entityId"),
          Seq("entityId"), "left")
        .select($"pred", $"obj", $"norm", $"entityId",
          coalesce($"comp", $"entityId").as("canonicalId"))
      a.write.mode("overwrite").parquet("/tmp/profile-assign")
    })
    time("lsh fit+join")(graft.link.Linking.linkEdges(
      graft.link.Linking.entities(triples.as[Triple])).count())
    spark.stop()
  }
}
