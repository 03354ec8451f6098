package graft

import graft.ops.Relational
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // FileStreamSource needs a directory: stage the single parquet file
  // into a temp dir
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"${sfDir("0.001")}/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }
  private lazy val batch = spark.read.parquet(eventsDir).cache()

  private def streamSource() =
    spark.readStream.schema(batch.schema).parquet(eventsDir)

  test("watermarked windowed counts == batch aggregation") {
    val streamed = Streaming.runToMemory(spark,
      Streaming.windowedEventCounts(streamSource()),
      "win_counts", OutputMode.Complete())
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val expected = batch
      .withColumn("ts", $"ts".cast("timestamp"))
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select($"window.start", $"event_type", $"n", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("stateful streaming sessionization == batch window sessionization") {
    val evs = streamSource()
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id")
      .as[Streaming.Ev]
    val streamed = Streaming.runToMemory(spark,
      Streaming.sessionizeStream(evs, gapSeconds = 1800L).toDF(),
      "sessions", OutputMode.Append())
      .as[(Long, Long, Long)].collect().toSet
    val expected = Relational.sessionize(batch, 1800L)
      .select($"event_id", $"user_id", $"session_seq".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == expected && streamed.nonEmpty)
  }
}
