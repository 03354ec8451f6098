package graft.tools

import graft.Pipeline
import graft.fixtures.FilesGen
import graft.store.Snapshots
import org.apache.spark.sql.SparkSession

/** Round-7 measurement: STEADY-STATE ingestion — K successive pinned
  * ingests of a fixed-size delta into the same run. Single-ingest
  * benches (TailBench) cannot see terms that grow with INGEST COUNT;
  * this one isolates the known one: the append-set maintenance of the
  * copy-on-write tail patches.
  *
  *   - TIERED (default): prior append sets carried under tombstones,
  *     binary-counter cascade → per-ingest append write ≈ O(delta),
  *     occasionally O(2^j·delta) for a cascade step; live set count
  *     O(log K).
  *   - LEGACY (pre-round-7): every patch re-reads and rewrites ALL
  *     accumulated appends → per-ingest append write grows ~linearly
  *     with K. At daily ingests over a 10^12-file corpus this is a
  *     hidden O(corpus) per-ingest term — the same failure class as
  *     the global relink the O(delta) tail replaced.
  *   - TIERED+FOLD: compactAppendFrac set — append mass folds into a
  *     fresh full snapshot past the threshold, prior versions expire,
  *     disk stays bounded.
  *
  * All three chains start from byte-identical copies of one pinned
  * base run and ingest identical deltas; final graphs are compared
  * with exceptAll. Per-ingest order of TIERED/LEGACY alternates to
  * expose (not bake in) warmup/phase bias.
  *
  * REGIME NOTE (first measurement): with a LARGE delta the merge set
  * touches every cb bucket (coverage ≈ B(1−e^{−merges/B})) and the
  * patch is a de-facto full rewrite — zero appends, the honest
  * copy-on-write trade. The append machinery governs the FREQUENT
  * SMALL ingest regime (micro-batches, stream_kg_ingest's shape):
  * merges ≪ B, most delta rows append — and that is also the regime
  * where ingest count K, and therefore legacy consolidation cost,
  * grows fastest. Size m ≪ B·filesPerBucket/10 to measure it.
  *
  * Usage: runMain graft.tools.SteadyStateBench [n] [m] [k] [foldFrac]
  *                                             [filesPerBucket]
  *   defaults: 200000 50000 8 0.1 500
  */
object SteadyStateBench {
  private val Tail = Seq("assign", "nodes", "edges")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val m = args.lift(1).map(_.toLong).getOrElse(50000L)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val foldFrac = args.lift(3).map(_.toDouble).getOrElse(0.1)
    val filesPerBucket = args.lift(4).map(_.toLong).getOrElse(500L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-steady-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-steady")
      .toString
    spark.sparkContext.setCheckpointDir(s"$root/_checkpoints")
    val richness = sys.env.getOrElse("SPARK_GRAFT_RICHNESS", "8").toInt
    val b = math.max(64L, n / filesPerBucket).toInt
    def cfg(fold: Option[Double]) = Pipeline.Config(
      canonBuckets = Some(b), compactAppendFrac = fold)
    def rd(dir: String) = {
      import spark.implicits._
      spark.read.parquet(dir).as[graft.SourceFile]
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    println(s"[steady] n=$n m=$m k=$k B=$b foldFrac=$foldFrac cpus=$cpus")
    val baseDir = s"$root/files_base"
    FilesGen.dataset(spark, n, richness = richness)
      .write.mode("overwrite").parquet(baseDir)
    val deltaDirs = (1 to k).map { i =>
      val d = s"$root/files_delta_$i"
      FilesGen.dataset(spark, m, richness = richness,
        start = n + (i - 1) * m).write.mode("overwrite").parquet(d)
      d
    }

    val runT = s"$root/runT"
    val tBase = timed(Pipeline.run(spark, rd(baseDir), runT, "base",
      cfg(None)))
    val tPin = timed(Pipeline.pinEpoch(spark, runT, "pin", cfg(None)))
    val runL = s"$root/runL"; copyDir(runT, runL)
    val runC = s"$root/runC"; copyDir(runT, runC)
    val runD = s"$root/runD"; copyDir(runT, runD)
    println(f"[steady] base=$tBase%.1fs pin=$tPin%.1fs")

    def mb(x: Long): Double = x / 1048576.0
    def report(tag: String, i: Int, dir: String, wall: Double): Unit = {
      // own append/patch write volume of THIS ingest's publishes, from
      // the live manifests (fileBytes keys are snapshot-relative)
      def own(prefix: String): Long = Tail.map { st =>
        Snapshots.readManifest(dir, st).fileBytes
          .map(_.collect { case (p, by) if p.startsWith(prefix) => by }.sum)
          .getOrElse(0L)
      }.sum
      val am = Snapshots.readManifest(dir, "assign")
      val logRows =
        if (Snapshots.isComplete(dir, Pipeline.CanonLogStage))
          Snapshots.readManifest(dir, Pipeline.CanonLogStage).rows
        else 0L
      val tailWall = Tail
        .map(st => Snapshots.readManifest(dir, st).wallMs / 1e3).sum
      val (netApp, sets) = Tail.map(st =>
        Snapshots.appendStats(Snapshots.readManifest(dir, st)))
        .reduce((a, c) => (a._1 + c._1, a._2 + c._2))
      println(f"[steady] i=$i%2d $tag%-6s wall=$wall%6.1fs " +
        f"tail=$tailWall%5.1fs appendWrite=${mb(own("append"))}%7.1fMB " +
        f"patchWrite=${mb(own("patch/"))}%7.1fMB " +
        f"netAppendRows=$netApp%9d sets=$sets%2d " +
        f"absorbed=${am.metrics.getOrElse("absorbedSets", "-")}%s " +
        f"merges=${am.metrics.getOrElse("merges", "-")}%s " +
        f"rewrittenDirs=${am.metrics.getOrElse("rewrittenDirs", "-")}%s " +
        f"compacted=${am.metrics.getOrElse("compacted", "-")}%s " +
        f"logRows=$logRows%s du=${mb(duDir(dir))}%7.1fMB")
    }

    (1 to k).foreach { i =>
      val delta = deltaDirs(i - 1)
      def runTiered(): Unit = {
        Snapshots.appendTiering = true
        val w = timed(Pipeline.runIncrementalPinned(
          spark, rd(delta), runT, s"d$i", cfg(None)))
        report("TIER", i, runT, w)
      }
      def runLegacy(): Unit = {
        Snapshots.appendTiering = false
        try {
          val w = timed(Pipeline.runIncrementalPinned(
            spark, rd(delta), runL, s"d$i", cfg(None)))
          report("LEGACY", i, runL, w)
        } finally Snapshots.appendTiering = true
      }
      if (i % 2 == 1) { runTiered(); runLegacy() }
      else { runLegacy(); runTiered() }
      // tiered + fold-past-threshold + expire-what-the-fold-unpinned
      val wC = timed(Pipeline.runIncrementalPinned(
        spark, rd(delta), runC, s"d$i", cfg(Some(foldFrac))))
      val freed = Tail.map { st =>
        val live = Snapshots.readManifest(runC, st).version.get
        Snapshots.versions(runC, st).filter(_ != live).reverse.count { v =>
          scala.util.Try(Snapshots.expire(runC, st, v)).isSuccess
        }
      }.sum
      report("FOLD", i, runC, wC)
      if (freed > 0) println(s"[steady] i=$i FOLD expired $freed versions")
      // merge-on-read: zero bucket rewrites per ingest; merges ride
      // the canon log until the threshold fold. Lineage maintenance
      // on: entities/link_edges/ep_* consolidate past 4 deltas
      val wD = timed(Pipeline.runIncrementalPinned(
        spark, rd(delta), runD, s"d$i",
        cfg(Some(foldFrac)).copy(deferMerges = true,
          maxLineageDeltas = Some(4))))
      val freedD = Tail.map { st =>
        val live = Snapshots.readManifest(runD, st).version.get
        Snapshots.versions(runD, st).filter(_ != live).reverse.count { v =>
          scala.util.Try(Snapshots.expire(runD, st, v)).isSuccess
        }
      }.sum
      report("DEFER", i, runD, wD)
      if (freedD > 0) println(s"[steady] i=$i DEFER expired $freedD versions")
    }

    // all four chains must hold the same graph (resolving readers:
    // pass-through unless a dirty canon log exists)
    val cols = Seq("canonicalId", "canonical", "kind", "memberCount")
    val ecols = Seq("subj", "pred", "canonicalId")
    def nodes(d: String) =
      Pipeline.readNodes(spark, d).selectExpr(cols: _*)
    def edges(d: String) =
      Pipeline.readEdges(spark, d).selectExpr(ecols: _*)
    // the merge-on-read READ TAX, priced: resolving read (broadcast
    // log join; nodes also re-aggregate) vs the raw stored snapshot
    Seq("TIER" -> runT, "DEFER" -> runD).foreach { case (tag, d) =>
      def t(body: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (rn, sn) = t(nodes(d).count())
      val (re, se) = t(edges(d).count())
      val (rr, sr) = t(Snapshots.read(spark, d, "nodes").count())
      println(f"[steady] readtax $tag dirty=${Pipeline.canonLogDirty(d)} " +
        f"nodesResolved=$rn in $sn%.2fs edgesResolved=$re in $se%.2fs " +
        f"nodesRaw=$rr in $sr%.2fs")
    }
    Seq("LEGACY" -> runL, "FOLD" -> runC, "DEFER" -> runD)
      .foreach { case (tag, d) =>
      val dn = nodes(runT).exceptAll(nodes(d)).count() +
        nodes(d).exceptAll(nodes(runT)).count()
      val de = edges(runT).exceptAll(edges(d)).count() +
        edges(d).exceptAll(edges(runT)).count()
      println(s"[steady] exceptAll TIER vs $tag: nodes=$dn edges=$de " +
        "(must be 0/0)")
      require(dn == 0 && de == 0, s"$tag diverged from tiered")
    }
    // ~6.5 GB of run dirs at the bench shape — keep only on request
    if (sys.env.contains("SPARK_GRAFT_KEEP")) {
      println(s"[steady] done root=$root (kept: SPARK_GRAFT_KEEP)")
    } else {
      println(s"[steady] done (root deleted; set SPARK_GRAFT_KEEP=1 " +
        "to keep run dirs for inspection)")
      Snapshots.deleteDir(root)
    }
    spark.stop()
  }

  private def duDir(dir: String): Long = {
    val p = java.nio.file.Path.of(dir)
    if (!java.nio.file.Files.exists(p)) return 0L
    val w = java.nio.file.Files.walk(p)
    try {
      val it = w.iterator()
      var s = 0L
      while (it.hasNext) {
        val f = it.next()
        if (java.nio.file.Files.isRegularFile(f))
          s += java.nio.file.Files.size(f)
      }
      s
    } finally w.close()
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Path.of(from)
    val walk = java.nio.file.Files.walk(src)
    try {
      val it = walk.iterator()
      while (it.hasNext) {
        val p = it.next()
        val dst = java.nio.file.Path.of(to).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
      }
    } finally walk.close()
  }
}
