package graft

import graft.store.{IOStat, Snapshots}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import scala.jdk.CollectionConverters._

/** Manifest-planned snapshot reads (round 7): `Snapshots.read` plans
  * scans from the manifest's file list + recorded schemas — zero
  * directory listing — and must be indistinguishable from the
  * listing path (`spark.read.parquet`) in schema, values, partition
  * column typing, and partition pruning.
  */
class SnapshotPlanSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-snapplan-$tag").toString

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Runs `body` with manifest planning forced on/off. */
  private def withPlan[T](on: Boolean)(body: => T): T = {
    val prev = Snapshots.manifestPlan
    Snapshots.manifestPlan = on
    try body finally Snapshots.manifestPlan = prev
  }

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("planned read == listed read on a partitioned full snapshot (schema, values, no listing)") {
    val dir = tmpDir("full")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("b")) {
      Seq((1L, 0, "x"), (2L, 0, "y"), (3L, 1, "z"), (4L, 2, "w"))
        .toDF("x", "b", "s")
    }
    IOStat.reset()
    val planned = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    // the planned path never fell back to the listing assembler
    assert(!IOStat.snapshot().contains("snap.assemble.listed"))
    val listed = withPlan(on = false)(Snapshots.read(spark, dir, "t"))
    assert(planned.schema == listed.schema) // incl. b inferred as int
    assert(planned.schema("b").dataType.typeName == "integer")
    assert(rowsOf(planned) == rowsOf(listed))
    // the scan really is manifest-planned
    val scans = planned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.exists(_.relation.location.getClass.getSimpleName
      .contains("ManifestFileIndex")))
    deleteRec(Path.of(dir))
  }

  test("planned partition pruning: filter on the partition column scans only its files") {
    val dir = tmpDir("prune")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("b")) {
      (0L until 30L).map(i => (i, (i % 3).toInt)).toDF("x", "b")
    }
    val df = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
      .filter($"b" === 1)
    assert(df.as[(Long, Int)].collect().toSet ==
      (0L until 30L).filter(_ % 3 == 1).map(i => (i, 1)).toSet)
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val all = Snapshots.readManifest(dir, "t").fileRows.keys
    val b1 = all.count(_.startsWith("b=1/"))
    assert(b1 > 0 && b1 < all.size)
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    df.count() // populate metrics
    assert(scan.metrics("numFiles").value == b1)
    deleteRec(Path.of(dir))
  }

  test("probe-shaped filter !cast(ident as boolean) prunes to ident=false files") {
    // the incrementalCanonicalize probe reads the stored assign table
    // filtered on its string ident partition via a boolean cast; this
    // pins that exact predicate shape to PARTITION pruning (not a
    // post-scan filter) under the manifest-planned index
    val dir = tmpDir("identprune")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("ident", "cb")) {
      (0L until 40L).map(i => (i, (i % 4 != 0).toString, (i % 5).toInt))
        .toDF("x", "ident", "cb")
    }
    val df = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
      .filter(!$"ident".cast("boolean"))
    assert(df.select($"x").as[Long].collect().toSet ==
      (0L until 40L).filter(_ % 4 == 0).toSet)
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val all = Snapshots.readManifest(dir, "t").fileRows.keys
    val falseFiles = all.count(_.contains("ident=false/"))
    assert(falseFiles > 0 && falseFiles < all.size)
    assert(scan.inputRDDs().head.partitions.nonEmpty) // force file listing
    df.count() // populate metrics
    assert(scan.metrics("numFiles").value == falseFiles,
      s"expected only the $falseFiles ident=false files to be scanned")
    deleteRec(Path.of(dir))
  }

  test("planned read == listed read across a copy-on-write patch chain incl. time travel") {
    val dir = tmpDir("chain")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("b")) {
      Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2)).toDF("x", "b")
    }
    Snapshots.stagePatch(spark, dir, "t", "p2", Seq("b=0"), Seq("b")) {
      Seq((1L, 0), (10L, 0)).toDF("x", "b")
    } {
      Seq((99L, 2)).toDF("x", "b")
    }
    Snapshots.stagePatch(spark, dir, "t", "p3", Seq("b=2"), Seq("b")) {
      Seq((7L, 2)).toDF("x", "b")
    } {
      Seq((50L, 1)).toDF("x", "b")
    }
    (1 to 3).foreach { v =>
      val planned = withPlan(on = true)(
        Snapshots.readVersion(spark, dir, "t", v))
      val listed = withPlan(on = false)(
        Snapshots.readVersion(spark, dir, "t", v))
      assert(rowsOf(planned.select("x", "b")) == rowsOf(listed.select("x", "b")),
        s"version $v diverged")
      assert(planned.select("x", "b").schema ==
        listed.select("x", "b").schema, s"version $v schema diverged")
    }
    // current read: patched bucket + carried dirs + append set, planned
    IOStat.reset()
    val cur = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    assert(!IOStat.snapshot().contains("snap.assemble.listed"))
    assert(cur.select("x", "b").as[(Long, Int)].collect().toSet ==
      Set((1L, 0), (10L, 0), (3L, 1), (50L, 1), (7L, 2)))
    deleteRec(Path.of(dir))
  }

  test("string-valued partition columns (true/false dirs) type as string on both paths") {
    val dir = tmpDir("strpart")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("q")) {
      Seq((1L, "true"), (2L, "false"), (3L, "false")).toDF("x", "q")
    }
    val planned = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    val listed = withPlan(on = false)(Snapshots.read(spark, dir, "t"))
    assert(planned.schema("q").dataType.typeName == "string")
    assert(planned.schema == listed.schema)
    assert(rowsOf(planned) == rowsOf(listed))
    assert(planned.filter(!$"q".cast("boolean")).count() == 2)
    deleteRec(Path.of(dir))
  }

  test("derived manifest schema == real file inference (nested, non-nullable source)") {
    val dir = tmpDir("dschema")
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("k")) {
      // typed source → non-nullable longs, nested struct + array:
      // the derived read-back schema must match inference exactly
      // (everything asNullable'd at the relation level)
      Seq((1L, (2L, "a"), Seq(1L, 2L), 0), (3L, (4L, "b"), Seq(3L), 1))
        .toDF("x", "st", "arr", "k")
    }
    val m = Snapshots.readManifest(dir, "t")
    val recorded = org.apache.spark.sql.types.DataType
      .fromJson(m.dataSchema.get)
    val file = m.fileRows.keys.head
    val inferred = spark.read
      .parquet(s"${Snapshots.stageDir(dir, "t")}/snap=1/$file").schema
    assert(recorded == inferred)
    val planned = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    val listed = withPlan(on = false)(Snapshots.read(spark, dir, "t"))
    assert(planned.schema == listed.schema)
    assert(rowsOf(planned) == rowsOf(listed))
    deleteRec(Path.of(dir))
  }

  test("non-exact round-trip type (timestamp_ntz) falls back to footer-read schema capture") {
    val dir = tmpDir("ntz")
    Snapshots.stage(spark, dir, "t", "p1", resume = false) {
      Seq((1L, "2024-01-02T03:04:05"), (2L, "2024-02-03T04:05:06"))
        .toDF("x", "s")
        .withColumn("ts", org.apache.spark.sql.functions
          .to_timestamp_ntz($"s")).drop("s")
    }
    val m = Snapshots.readManifest(dir, "t")
    val recorded = org.apache.spark.sql.types.DataType
      .fromJson(m.dataSchema.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(recorded("ts").dataType.typeName == "timestamp_ntz")
    val planned = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    val listed = withPlan(on = false)(Snapshots.read(spark, dir, "t"))
    assert(planned.schema == listed.schema)
    assert(rowsOf(planned) == rowsOf(listed))
    deleteRec(Path.of(dir))
  }

  test("ambiguous partition values refuse a recorded schema and fall back to listing") {
    val dir = tmpDir("amb")
    // date-like partition values: Spark inference would type them as
    // DATE; the publisher must NOT record a partition schema for them
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("d")) {
      Seq((1L, "2024-01-02"), (2L, "2024-01-03")).toDF("x", "d")
    }
    assert(Snapshots.readManifest(dir, "t").partSchema.isEmpty)
    IOStat.reset()
    val df = withPlan(on = true)(Snapshots.read(spark, dir, "t"))
    assert(IOStat.snapshot().contains("snap.assemble.listed"))
    assert(df.count() == 2)
    deleteRec(Path.of(dir))
  }

  /** Runs `body` with tiered appends forced on/off. */
  private def withTiering[T](on: Boolean)(body: => T): T = {
    val prev = Snapshots.appendTiering
    Snapshots.appendTiering = on
    try body finally Snapshots.appendTiering = prev
  }

  private def readSet(dir: String): Set[(Long, Int)] =
    Snapshots.read(spark, dir, "t").select("x", "b")
      .as[(Long, Int)].collect().toSet

  test("tiered appends: a large prior set is CARRIED under tombstones, rows stay exact") {
    val dir = tmpDir("tier")
    withTiering(on = true) {
      Snapshots.stage(spark, dir, "t", "p1", resume = false,
        partitionBy = Seq("b")) {
        Seq((1L, 0), (2L, 1), (3L, 2)).toDF("x", "b")
      }
      // v2: rewrite b=0, append TEN rows spanning b=1 / b=2
      Snapshots.stagePatch(spark, dir, "t", "p2", Seq("b=0"), Seq("b")) {
        Seq((10L, 0)).toDF("x", "b")
      } {
        ((100L to 104L).map((_, 1)) ++ (200L to 204L).map((_, 2)))
          .toDF("x", "b")
      }
      // v3: rewrite b=2 (full new content (30,2)), tiny append. The
      // ten-row prior set must NOT be re-read/rewritten: it stays
      // carried, its five b=2 rows tombstoned
      Snapshots.stagePatch(spark, dir, "t", "p3", Seq("b=2"), Seq("b")) {
        Seq((30L, 2)).toDF("x", "b")
      } {
        Seq((300L, 1)).toDF("x", "b")
      }
      val m3 = Snapshots.readManifest(dir, "t")
      val appendCarried = m3.baseFiles.get.keys
        .filter(_.contains("/append/")).toVector
      assert(appendCarried.nonEmpty &&
        appendCarried.forall(_.startsWith("snap=2/append/d")),
        s"the v2 append set must be carried by reference: $appendCarried")
      assert(m3.appendExcludes.get.values.flatten.toSet == Set("b=2"))
      val expect3 = Set((10L, 0), (2L, 1), (30L, 2)) ++
        (100L to 104L).map((_, 1)).toSet + ((300L, 1))
      assert(readSet(dir) == expect3)
      assert(m3.rows == expect3.size.toLong,
        s"manifest rows must be exact under tombstones: ${m3.rows}")
      // planned and listed paths agree THROUGH the tombstone filter
      assert(rowsOf(withPlan(on = true)(
          Snapshots.read(spark, dir, "t")).select("x", "b")) ==
        rowsOf(withPlan(on = false)(
          Snapshots.read(spark, dir, "t")).select("x", "b")))
      // time travel: v2 still sees all ten append rows
      assert(Snapshots.readVersion(spark, dir, "t", 2).count() == 13)
      // v4: rewrite b=1 — the carried set's net visible rows drop to
      // zero (both its value groups now tombstoned) and the cascade
      // absorbs it; its files leave the manifest
      Snapshots.stagePatch(spark, dir, "t", "p4", Seq("b=1"), Seq("b")) {
        Seq((40L, 1)).toDF("x", "b")
      } {
        Seq((400L, 0)).toDF("x", "b")
      }
      val m4 = Snapshots.readManifest(dir, "t")
      assert(!m4.baseFiles.get.keys.exists(_.startsWith("snap=2/append")))
      val expect4 = Set((10L, 0), (400L, 0), (40L, 1), (30L, 2))
      assert(readSet(dir) == expect4 && m4.rows == expect4.size.toLong)
    }
    deleteRec(Path.of(dir))
  }

  test("tiered == legacy consolidation over the same patch sequence (content and rows)") {
    def run(tiering: Boolean): (Set[(Long, Int)], Long) = {
      val dir = tmpDir(s"ab$tiering")
      try withTiering(on = tiering) {
        Snapshots.stage(spark, dir, "t", "p1", resume = false,
          partitionBy = Seq("b")) {
          (0L until 12L).map(i => (i, (i % 3).toInt)).toDF("x", "b")
        }
        Snapshots.stagePatch(spark, dir, "t", "p2", Seq("b=0"), Seq("b")) {
          Seq((100L, 0)).toDF("x", "b")
        } { ((200L to 206L).map((_, 1)) :+ (210L, 2L.toInt)).toDF("x", "b") }
        Snapshots.stagePatch(spark, dir, "t", "p3", Seq("b=1"), Seq("b")) {
          Seq((101L, 1)).toDF("x", "b")
        } { Seq((301L, 2)).toDF("x", "b") }
        Snapshots.stagePatch(spark, dir, "t", "p4", Seq("b=2"), Seq("b")) {
          Seq((102L, 2)).toDF("x", "b")
        } { spark.emptyDataset[(Long, Int)].toDF("x", "b") }
        (readSet(dir), Snapshots.readManifest(dir, "t").rows)
      } finally deleteRec(Path.of(dir))
    }
    val (tiered, tieredRows) = run(tiering = true)
    val (legacy, legacyRows) = run(tiering = false)
    assert(tiered == legacy, "tiered appends changed the table content")
    assert(tieredRows == legacyRows && tieredRows == tiered.size.toLong)
  }

  test("binary-counter cascade keeps the live append-set count logarithmic") {
    val dir = tmpDir("cascade")
    withTiering(on = true) {
      Snapshots.stage(spark, dir, "t", "p1", resume = false,
        partitionBy = Seq("b")) {
        Seq((1L, 0), (2L, 1)).toDF("x", "b")
      }
      val k = 8
      (1 to k).foreach { i =>
        Snapshots.stagePatch(spark, dir, "t", s"p$i", Seq("b=0"), Seq("b")) {
          Seq((1L, 0)).toDF("x", "b")
        } { Seq((1000L + i, 1), (2000L + i, 1)).toDF("x", "b") }
      }
      val m = Snapshots.readManifest(dir, "t")
      val sets = m.baseFiles.get.keys.filter(_.contains("/append/"))
        .map(_.split("/part").head).toSet.size +
        m.fileRows.keys.count(_.startsWith("append/")).min(1)
      val bound = (math.log(k * 2.0) / math.log(2)).toInt + 1
      assert(sets <= bound, s"live append sets $sets > log bound $bound")
      assert(m.metrics("appendSets").toInt == sets)
      // every appended row is still visible exactly once
      assert(Snapshots.read(spark, dir, "t").count() == 2L + 2 * k)
      assert(m.rows == 2L + 2 * k)
    }
    deleteRec(Path.of(dir))
  }

  test("tiered == legacy over SEEDED RANDOM patch sequences (content + exact rows)") {
    // randomized twin of the hand-built chains above: random rewritten
    // buckets and random appends per patch, fixed seed for driver
    // determinism. Multiset equality via sorted sequences (a Set would
    // mask dropped duplicates).
    val rnd = new scala.util.Random(20260818L)
    (1 to 5).foreach { trial =>
      val steps = (1 to (2 + rnd.nextInt(3))).map { _ =>
        val rew = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(4)).distinct
        val app = Seq.fill(rnd.nextInt(6))(
          (1000L + rnd.nextInt(9000), rnd.nextInt(4)))
          .filterNot { case (_, b) => rew.contains(b) }
        (rew, app)
      }
      def run(tiering: Boolean): (Seq[(Long, Int)], Long) = {
        val dir = tmpDir(s"rand$trial$tiering")
        try withTiering(on = tiering) {
          Snapshots.stage(spark, dir, "t", "p0", resume = false,
            partitionBy = Seq("b")) {
            Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)).toDF("x", "b")
          }
          steps.zipWithIndex.foreach { case ((rew, app), i) =>
            Snapshots.stagePatch(spark, dir, "t", s"p${i + 1}",
              rew.map(b => s"b=$b"), Seq("b")) {
              rew.map(b => (100L + b, b)).toDF("x", "b")
            } {
              if (app.isEmpty) spark.emptyDataset[(Long, Int)].toDF("x", "b")
              else app.toDF("x", "b")
            }
          }
          (Snapshots.read(spark, dir, "t").select("x", "b")
            .as[(Long, Int)].collect().toSeq.sorted,
            Snapshots.readManifest(dir, "t").rows)
        } finally deleteRec(Path.of(dir))
      }
      val (tiered, tRows) = run(tiering = true)
      val (legacy, lRows) = run(tiering = false)
      assert(tiered == legacy, s"trial $trial diverged ($steps)")
      assert(tRows == lRows && tRows == tiered.size.toLong,
        s"trial $trial rows: $tRows vs $lRows vs ${tiered.size}")
    }
  }

  test("compact folds buckets, patches and tombstoned appends into a full snapshot; old versions expire") {
    val dir = tmpDir("compact")
    withTiering(on = true) {
      Snapshots.stage(spark, dir, "t", "p1", resume = false,
        partitionBy = Seq("b")) {
        Seq((1L, 0), (2L, 1), (3L, 2)).toDF("x", "b")
      }
      Snapshots.stagePatch(spark, dir, "t", "p2", Seq("b=0"), Seq("b")) {
        Seq((10L, 0)).toDF("x", "b")
      } { ((100L to 105L).map((_, 1)) :+ (200L, 2L.toInt)).toDF("x", "b") }
      Snapshots.stagePatch(spark, dir, "t", "p3", Seq("b=2"), Seq("b")) {
        Seq((30L, 2)).toDF("x", "b")
      } { Seq((300L, 1)).toDF("x", "b") }
      val before = readSet(dir)
      val mPatched = Snapshots.readManifest(dir, "t")
      assert(Snapshots.appendStats(mPatched)._1 > 0)
      // pre-compact: carried files pin old versions against expiry
      intercept[IllegalArgumentException](Snapshots.expire(dir, "t", 1))

      Snapshots.compact(spark, dir, "t", "maint")()
      val mC = Snapshots.readManifest(dir, "t")
      assert(mC.metrics.get("compacted").contains("true"))
      assert(mC.baseFiles.forall(_.isEmpty) &&
        Snapshots.appendStats(mC) == (0L, 0))
      assert(readSet(dir) == before, "compaction changed the content")
      assert(mC.rows == before.size.toLong)
      // partitioning survived the fold: files live under b=* dirs
      assert(mC.fileRows.keys.forall(_.contains("b=")))
      // every pre-compact version is now expirable (newest-first: the
      // guard also protects files carried by EXPIRED-LATER manifests)
      Seq(3, 2, 1).foreach(Snapshots.expire(dir, "t", _))
      assert(readSet(dir) == before)
    }
    deleteRec(Path.of(dir))
  }
}
