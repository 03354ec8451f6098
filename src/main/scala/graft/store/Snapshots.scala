package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Iceberg-emulation snapshot store (SURVEY.md §7.4: no iceberg jar in
  * /opt/spark/jars, so snapshots/manifests/atomic publish are
  * hand-rolled but minimal).
  *
  * Layout: <runDir>/stage=<name>/  parquet files + _MANIFEST.json
  *
  * Publish protocol: data first, manifest LAST via write-to-temp +
  * atomic rename. A stage directory without _MANIFEST.json is
  * incomplete and gets re-run — this is exactly the reference's
  * de-facto checkpoint semantics (each completed document is already
  * on disk, /root/reference/python.py:733-740) lifted from per-file to
  * per-stage granularity, which is what makes `resume ≡ fresh run`
  * testable (FIXTURES.md §5).
  *
  * The manifest carries per-output-file row counts (per-partition
  * lineage) plus caller metrics — the analog of the reference's
  * ProcessingTimer phases and output metadata dict
  * (/root/reference/app.py:103-161).
  */
object Snapshots {

  final case class Manifest(
      runId: String,
      stage: String,
      rows: Long,
      fileRows: Map[String, Long],
      wallMs: Long,
      metrics: Map[String, String],
      // snapshot version (Iceberg-style time travel); None on
      // manifests written before versioning existed (data then lives
      // directly under the stage dir)
      version: Option[Int] = None,
      // COPY-ON-WRITE patches (stagePatch): files CARRIED from earlier
      // snapshots, keyed by stage-relative path (snap=<w>/...). The
      // effective table = these + this version's own fileRows; `rows`
      // counts both. None/empty on full snapshots.
      baseFiles: Option[Map[String, Long]] = None
  )

  private val ManifestName = "_MANIFEST.json"

  /** Stage parquet codec: lz4 measurably beats snappy on encode CPU
    * for these string-heavy triple tables (WriteProbe: ~30% less write
    * wall at equal size) — and stage files are only ever read back by
    * this engine, so cross-tool codec compatibility is not a concern.
    */
  val StageCompression = "lz4"

  def stageDir(runDir: String, stage: String): String =
    s"$runDir/stage=$stage"

  /** Data directory of a specific snapshot version. */
  def snapshotDir(runDir: String, stage: String, version: Int): String =
    s"${stageDir(runDir, stage)}/snap=$version"

  private def dataDir(runDir: String, stage: String, m: Manifest): String =
    m.version match {
      case Some(v) => snapshotDir(runDir, stage, v)
      case None    => stageDir(runDir, stage) // pre-versioning layout
    }

  def isComplete(runDir: String, stage: String): Boolean =
    Files.exists(Paths.get(stageDir(runDir, stage), ManifestName))

  /** Current snapshot of a stage (the one the live manifest points at). */
  def read(spark: SparkSession, runDir: String, stage: String): DataFrame =
    assemble(spark, runDir, stage, readManifest(runDir, stage))

  /** TIME TRAVEL: read a stage as of snapshot `version`. Every publish
    * keeps its data files under snap=<v>/ and its manifest as
    * _MANIFEST.v<v>.json (the Iceberg snapshot-log shape), so any
    * historical version remains queryable until `expire` removes it.
    */
  def readVersion(spark: SparkSession, runDir: String, stage: String,
                  version: Int): DataFrame = {
    // verifies the manifest exists (a snapshot without one was never
    // published and must not be readable)
    val m = readManifestVersion(runDir, stage, version)
    assemble(spark, runDir, stage, m)
  }

  /** The snapshot a manifest describes. A FULL snapshot is one parquet
    * dir; a PATCH (baseFiles non-empty) assembles its own files plus
    * the carried files of earlier snapshots — grouped per source
    * snapshot so partition columns parse against each snapshot's own
    * basePath (the Iceberg manifest-list read shape).
    */
  private def assemble(spark: SparkSession, runDir: String, stage: String,
                       m: Manifest): DataFrame = {
    val carried = m.baseFiles.getOrElse(Map.empty)
    if (carried.isEmpty) return spark.read.parquet(dataDir(runDir, stage, m))
    val sd = stageDir(runDir, stage)
    val own = m.fileRows.keys.map(k => s"snap=${m.version.get}/$k")
    // read root per file = snap=<w> plus any non-partition subdirs
    // (patch/, append/): partition columns parse relative to the root,
    // and a root with no k=v segments below it reads as plain files
    // whose partition columns ride as data columns (the append set)
    def root(p: String): String = {
      val dirs = p.split('/').init // drop the filename
      (dirs.head +: dirs.tail.takeWhile(s => !s.contains('=')))
        .mkString("/")
    }
    (own ++ carried.keys).toVector
      .groupBy(root)
      .toSeq.sortBy(_._1)
      .map { case (r, paths) =>
        spark.read.option("basePath", s"$sd/$r")
          .parquet(paths.map(p => s"$sd/$p"): _*)
      }
      .reduce(_ unionByName _)
  }

  /** Every file (stage-relative) a manifest's snapshot is made of. */
  private def effectiveFiles(m: Manifest): Map[String, Long] = {
    val ownPrefix = m.version.map(v => s"snap=$v/").getOrElse("")
    m.fileRows.map { case (k, n) => s"$ownPrefix$k" -> n } ++
      m.baseFiles.getOrElse(Map.empty)
  }

  /** All PUBLISHED versions of a stage, ascending. Published = the
    * live pointer (_MANIFEST.json, always written LAST) has reached
    * at least that version. A crashed publish leaves a versioned
    * manifest NEWER than the live pointer — that snapshot was never
    * visible to any reader and must stay invisible here too:
    * runIncremental unions versions() and resultFrom sums them, so an
    * orphan counted once would double-count its delta after the retry
    * republishes it under the same version number.
    */
  def versions(runDir: String, stage: String): Seq[Int] = {
    val live = liveVersion(runDir, stage)
    manifestVersions(runDir, stage).filter(_ <= live)
  }

  /** Version the live pointer references (0 = none published). */
  private def liveVersion(runDir: String, stage: String): Int =
    if (isComplete(runDir, stage))
      readManifest(runDir, stage).version.getOrElse(0)
    else 0

  /** Every versioned manifest ON DISK, published or orphaned. */
  private def manifestVersions(runDir: String, stage: String): Seq[Int] = {
    val dir = Paths.get(stageDir(runDir, stage))
    if (!Files.exists(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScalaIterator()
      .map(_.getFileName.toString)
      .collect { case VersionedManifestRe(v) => v.toInt }
      .toVector.sorted
    finally s.close()
  }

  /** Drop the data and manifest of an old snapshot (Iceberg
    * expire_snapshots analog). Refuses to expire the current version.
    */
  def expire(runDir: String, stage: String, version: Int): Unit = {
    val current = readManifest(runDir, stage).version
    require(!current.contains(version),
      s"cannot expire the current snapshot v$version of $stage")
    // copy-on-write patches CARRY files of earlier snapshots: deleting
    // a snapshot some published patch still references would corrupt
    // that (readable, possibly live) version
    val prefix = s"snap=$version/"
    versions(runDir, stage).filter(_ != version).foreach { v =>
      val m = readManifestVersion(runDir, stage, v)
      require(!m.baseFiles.exists(_.keys.exists(_.startsWith(prefix))),
        s"cannot expire v$version of $stage: patch snapshot v$v still " +
          "carries its files (expire v$v first)")
    }
    deleteDir(snapshotDir(runDir, stage, version))
    Files.deleteIfExists(
      Paths.get(stageDir(runDir, stage), versionedManifestName(version)))
  }

  /** Recursive delete (no-op when absent). */
  private[graft] def deleteDir(path: String): Unit = {
    val dir = Paths.get(path)
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.iterator().asScalaIterator().toVector.reverseIterator
        .foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  private val VersionedManifestRe = """_MANIFEST\.v(\d+)\.json""".r
  private def versionedManifestName(v: Int) = s"_MANIFEST.v$v.json"

  def readManifest(runDir: String, stage: String): Manifest =
    parseManifest(Paths.get(stageDir(runDir, stage), ManifestName))

  def readManifestVersion(runDir: String, stage: String,
                          version: Int): Manifest = {
    // refuse orphans of a crashed publish (manifest on disk but the
    // live pointer never reached it): unpublished data is unreadable
    require(version <= liveVersion(runDir, stage),
      s"snapshot v$version of $stage was never published")
    parseManifest(
      Paths.get(stageDir(runDir, stage), versionedManifestName(version)))
  }

  private def parseManifest(p: Path): Manifest = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(Files.readString(p)).extract[Manifest]
  }

  /** Compute-or-resume: if the stage is complete, read it back;
    * otherwise evaluate `compute`, write a NEW SNAPSHOT VERSION, and
    * publish its manifest. Returns the stage as a (re-read) DataFrame
    * so downstream stages always consume the durable snapshot, never
    * a live lineage.
    *
    * Versioning (Iceberg snapshot emulation): data lands under
    * snap=<v>/, the versioned manifest _MANIFEST.v<v>.json is written
    * next, and the live pointer _MANIFEST.json is renamed into place
    * LAST — readers either see the previous complete snapshot or the
    * new one, never a partial. A publish that crashed between the
    * versioned manifest and the live pointer left an ORPHAN (manifest
    * + data, never visible to any reader); the next compute DELETES
    * every orphan above the live pointer and republishes as
    * live + 1 — so a crashed publish is truly invisible: versions()
    * never lists it, and the retry cannot double-count it next to its
    * own replacement. Historical published versions stay queryable
    * via readVersion until expire()d.
    */
  def stage(spark: SparkSession, runDir: String, stageName: String,
            runId: String, resume: Boolean = true,
            partitionBy: Seq[String] = Nil,
            metrics: => Map[String, String] = Map.empty)
           (compute: => DataFrame): DataFrame = {
    if (resume && isComplete(runDir, stageName))
      return read(spark, runDir, stageName)

    val version = prepareNextVersion(runDir, stageName)
    val dir = snapshotDir(runDir, stageName, version)
    val t0 = System.nanoTime()
    val df = compute
    val writer = df.write.mode(SaveMode.Overwrite)
      .option("compression", StageCompression)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dir)
    val wallMs = (System.nanoTime() - t0) / 1000000L

    // per-partition lineage: row count per produced file, read from
    // the parquet FOOTERS on the driver (no Spark job, no data
    // re-scan — the Iceberg-manifest approach). Keyed by the
    // snapshot-relative path: partitionBy layouts reuse part-file
    // basenames across partition dirs.
    val perFile = footerCounts(dir)
    val rows = perFile.values.sum

    val m = Manifest(runId, stageName, rows, perFile, wallMs, metrics,
      version = Some(version))
    val sd = stageDir(runDir, stageName)
    writeManifest(sd, versionedManifestName(version), m)
    writeManifest(sd, ManifestName, m)
    spark.read.parquet(dir)
  }

  /** Orphan cleanup + next version number (shared publish prelude): a
    * publish that crashed between the versioned manifest and the live
    * pointer left invisible data — delete it and reuse its number.
    */
  private def prepareNextVersion(runDir: String, stageName: String): Int = {
    val live = liveVersion(runDir, stageName)
    manifestVersions(runDir, stageName).filter(_ > live).foreach { v =>
      Files.deleteIfExists(
        Paths.get(stageDir(runDir, stageName), versionedManifestName(v)))
      deleteDir(snapshotDir(runDir, stageName, v))
    }
    live + 1
  }

  /** PARTIAL-OVERWRITE publish (the Iceberg copy-on-write MERGE
    * shape): a new snapshot version whose data =
    *   - snap=<v+1>/patch/  — `rewrite`'s output, partitioned: the
    *     FULL new content of every dir in `rewrittenDirs`;
    *   - snap=<v+1>/append/ — `append`'s output, UNPARTITIONED (the
    *     partition columns ride as data columns): genuinely new rows
    *     for dirs that are NOT rewritten. Appends scatter across
    *     arbitrary partition values (new entities hash anywhere), and
    *     writing them through the partitioned layout would touch one
    *     dir+file per value per ingest — measured as THE dominant
    *     patch cost (dynamic-commit + footer + listing over ~B tiny
    *     files). As unpartitioned delta files they cost O(1) files per
    *     ingest; readers filter them by column stats instead of dir
    *     pruning, which is proportionate to their (delta) size. The
    *     Iceberg analog: rewritten data files vs appended delta files
    *     in one snapshot.
    * plus every file of the current snapshot NOT under one of
    * `rewrittenDirs` — carried by reference in the manifest, never
    * copied. `rewrittenDirs` entries are single partition-path
    * segments (e.g. "cb=7"): a carried file is dropped iff any of its
    * path segments matches one.
    *
    * NOTE for callers: partition columns read back with
    * partition-inference types (ident: string, cb: int) — the append
    * frame must carry them with exactly those types.
    *
    * Same publish protocol as [[stage]] (data → versioned manifest →
    * live pointer last), so a crashed patch is invisible and the
    * retry republishes under the same version number.
    */
  def stagePatch(spark: SparkSession, runDir: String, stageName: String,
                 runId: String, rewrittenDirs: Seq[String],
                 partitionBy: Seq[String],
                 metrics: => Map[String, String] = Map.empty)
                (rewrite: => DataFrame)(append: => DataFrame): DataFrame = {
    val base = readManifest(runDir, stageName)
    require(base.version.isDefined,
      s"stage $stageName predates snapshot versioning — cannot patch")
    val version = prepareNextVersion(runDir, stageName)
    val dir = snapshotDir(runDir, stageName, version)
    val sd = stageDir(runDir, stageName)
    val rewritten = rewrittenDirs.toSet
    val baseEff = effectiveFiles(base)
    def isAppendFile(p: String) = p.split('/').contains("append")
    // prior append files CONSOLIDATE into this patch's append set
    // (minus rows that now live in rewritten dirs — the caller's
    // pruned rewrite read has already re-emitted those): appends never
    // accumulate beyond one file set, and a row appended to a bucket
    // that later rewrites cannot survive twice
    val priorAppendPaths = baseEff.keys.filter(isAppendFile).toVector.sorted
    val priorKept: Option[DataFrame] =
      if (priorAppendPaths.isEmpty) None
      else {
        val df = spark.read.parquet(priorAppendPaths.map(p => s"$sd/$p"): _*)
        val byCol = rewrittenDirs.map(_.split("=", 2))
          .groupBy(_.head).map { case (c, vs) => (c, vs.map(_(1))) }
        Some(byCol.foldLeft(df) { case (d, (c, vs)) =>
          d.filter(!col(c).cast("string").isin(vs: _*))
        })
      }
    val t0 = System.nanoTime()
    val w1 = rewrite.write.mode(SaveMode.Overwrite)
      .option("compression", StageCompression)
    (if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1)
      .parquet(s"$dir/patch")
    priorKept.map(append.unionByName(_)).getOrElse(append)
      .write.mode(SaveMode.Overwrite)
      .option("compression", StageCompression)
      .parquet(s"$dir/append")
    val wallMs = (System.nanoTime() - t0) / 1000000L

    val carried = baseEff.filterNot { case (path, _) =>
      path.split('/').exists(rewritten.contains) || isAppendFile(path)
    }
    val tF0 = System.nanoTime()
    val perFile = footerCounts(dir)
    val footerSec = (System.nanoTime() - tF0) / 1e9
    val m = Manifest(runId, stageName,
      rows = perFile.values.sum + carried.values.sum,
      fileRows = perFile, wallMs = wallMs,
      metrics = metrics ++ Map("patched" -> "true",
        "rewrittenDirs" -> rewrittenDirs.length.toString,
        "footerSec" -> f"$footerSec%.2f",
        "newFiles" -> perFile.size.toString),
      version = Some(version),
      baseFiles = Some(carried))
    writeManifest(sd, versionedManifestName(version), m)
    writeManifest(sd, ManifestName, m)
    assemble(spark, runDir, stageName, m)
  }

  /** Footer-derived per-file row counts for every *.parquet under
    * `dir`, keyed by dir-relative path.
    *
    * Footers are opened on a bounded driver-side pool: a partitionBy
    * layout produces (tasks × partition values) small files, and the
    * ~10 ms per-open FS overhead is pure latency — serial reads cost
    * seconds per stage and dominated small pipeline runs.
    */
  def footerCounts(dir: String): Map[String, Long] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val base = Paths.get(dir)
    val walk = Files.walk(base)
    val files =
      try walk.iterator().asScalaIterator()
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toVector
      finally walk.close()
    val conf = new Configuration()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, files.size)))
    try {
      val futures = files.map { p =>
        pool.submit(new java.util.concurrent.Callable[(String, Long)] {
          def call(): (String, Long) = {
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new HPath(p.toString), conf))
            try base.relativize(p).toString -> reader.getRecordCount
            finally reader.close()
          }
        })
      }
      futures.map(_.get()).toMap
    } finally pool.shutdown()
  }

  private implicit class IterAdapter[T](it: java.util.Iterator[T]) {
    def asScalaIterator(): Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Single-file export — the reference's ZIP batch packaging analog
    * (/root/reference/app.py:513-526): one artifact for hand-off.
    * coalesce(1) is an explicit final-mile choice; never use it on a
    * table that should stay distributed.
    */
  def exportSingle(df: DataFrame, dir: String,
                   format: String = "csv"): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").format(format).save(dir)

  private def writeManifest(dir: String, name: String, m: Manifest): Unit = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmts: Formats = DefaultFormats
    val json = Serialization.writePretty(m)
    val tmp: Path = Paths.get(dir, s".$name.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
