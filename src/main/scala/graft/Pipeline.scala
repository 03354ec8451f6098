package graft

import graft.canon.ConnectedComponents
import graft.extract.Extraction
import graft.link.{Linking, SkewJoin}
import graft.store.Snapshots
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The 4-stage KG-construction pipeline (north rule):
  *
  *   files ─repartitionByRange(repo,path)→
  *   [extract]  mapPartitions rule extractors → triples ∪ quarantine
  *   [link]     entities → exact-norm + MinHash-LSH edges
  *   [canon]    connected components → canonical entity ids
  *   [materialize] node + edge tables, partitioned by kind / pred
  *
  * Every stage boundary is a durable snapshot (Snapshots.stage) with a
  * manifest published last — `run` with resume=true skips any stage
  * whose manifest exists, so a killed run resumes idempotently
  * mid-pipeline and downstream stages always read the durable parquet,
  * never live lineage.
  */
object Pipeline {

  final case class Config(
      extraction: Extraction.Config = Extraction.Config(),
      link: Linking.Config = Linking.Config(),
      hotThreshold: Long = 100000L,
      // CC edge-count threshold below which the driver union-find fast
      // path runs instead of the distributed star fixpoint (see
      // ConnectedComponents.LocalEdgeThreshold). 0 forces the
      // distributed path — the bench uses that to exercise/measure the
      // 100 TB-only path on corpora whose edge sets would otherwise
      // ride the driver.
      ccLocalThreshold: Long = canon.ConnectedComponents.LocalEdgeThreshold,
      resume: Boolean = true,
      // extraction partition count (= extract-stage task and output-
      // file count). Defaults to the cluster's defaultParallelism;
      // size it to the corpus the way you'd size maxPartitionBytes at
      // 100 TB — a 2k-file smoke corpus has no use for 32 near-empty
      // tasks × pred partition dirs.
      arrangePartitions: Option[Int] = None,
      // CANONICAL-BUCKET layout (opt-in): when Some(B), the assign /
      // nodes / edges snapshots gain a cb = pmod(canonicalId, B)
      // partition column, which is what lets an epoch-pinned ingest
      // REWRITE ONLY THE BUCKETS whose canonical components changed
      // (Snapshots.stagePatch) instead of recomputing the tables
      // globally. B is baked into the snapshot layout (recorded in the
      // manifests); size it so one bucket ≈ a comfortable task input
      // at the corpus scale — B is the knob that keeps per-merge patch
      // IO ≈ |touched buckets| × corpus/B as the corpus grows (the
      // same sizing contract as maxPartitionBytes). None (default) =
      // today's layout, zero cost to non-incremental runs.
      canonBuckets: Option[Int] = None,
      // Use the O(delta) canonicalize tail on pinned ingests (driver
      // union-find over the delta's component-pair graph + bucket
      // patches). Requires canonBuckets on the base run; falls back to
      // the global tail when preconditions fail. false = always global
      // (the A/B lever IncrementalBench measures).
      incrementalCanon: Boolean = true,
      // Refuse a pinned ingest whose census drift exceeds this bound
      // (fraction of the delta's distinct (pred, shingle) keys whose
      // hot/stop classification differs between the pinned census and
      // a fresh census at the current corpus size). None = record the
      // drift in the manifest but never refuse.
      maxCensusDrift: Option[Double] = None,
      // Fraction of the delta's (pred, shingle) KEYS the drift
      // measurement prices (deterministic hash sample of the key
      // space; dfs for the sampled keys stay exact). 1.0 = every
      // delta key. The metric guides a re-pin decision — an unbiased
      // mean over a uniform key sample is enough, and exact dfs keep
      // near-cap keys classified correctly (row-sampling does not;
      // see censusDrift).
      driftSample: Double = 1.0,
      // Append-maintenance trigger for the O(delta) tail: after a
      // patched ingest, any of assign/nodes/edges whose net append
      // rows exceed this fraction of the table folds into a fresh
      // FULL snapshot (Snapshots.compact — the Iceberg
      // rewrite_data_files shape). Amortization: a fold costs
      // O(table) but only fires every ~frac·table/delta ingests, so
      // the amortized per-ingest cost stays O(delta/frac); between
      // folds, tiered tombstoned append sets keep per-ingest append
      // work O(delta·log). None (default) = never fold here — run
      // compactTail as an explicit maintenance job instead, the
      // Iceberg operational shape.
      compactAppendFrac: Option[Double] = None,
      // MERGE-ON-READ canonicalization for pinned ingests (requires
      // canonBuckets + incrementalCanon). The copy-on-write tail
      // rewrites every bucket a merge touches; merge coverage is
      // ≈ B·(1−e^(−merges/B)), so in the FREQUENT-SMALL-INGEST regime
      // even a few hundred merges force a large-fraction table
      // rewrite per micro-batch (SteadyStateBench measured ~45% of
      // the table per 500-file delta). With deferMerges the ingest
      // writes only O(delta) appends plus a tiny compressed CANON LOG
      // (old root → new root, single-hop); readers resolve stale
      // canonicals through one broadcast join (Pipeline.readNodes /
      // readEdges — nodes additionally re-aggregate, which their
      // schema combines associatively), and compactTail folds the log
      // physically past compactAppendFrac. The LSM/Iceberg
      // merge-on-read trade: O(delta) writes, a bounded read tax
      // until the next fold.
      deferMerges: Boolean = false,
      // Consolidate a lineage stage (entities / link_edges /
      // ep_shingles / ep_keys) into a fresh full version whenever its
      // delta count exceeds this, at the START of the next pinned
      // ingest (see compactLineage): bounds the K-way union reads and
      // K-manifest sums that otherwise grow with ingest count. Cost
      // O(stage) amortized over maxDeltas ingests. None = never.
      maxLineageDeltas: Option[Int] = None
  )

  final case class Result(
      runId: String,
      triples: Long,
      quarantined: Long,
      entities: Long,
      linkEdges: Long,
      nodes: Long,
      edges: Long,
      ccIterations: Int
  )


  /** Run independent publish tasks concurrently and propagate the
    * first failure only after every task finished or failed (no write
    * still in flight when the caller sees the error). Shared by every
    * concurrent-publish site: the tasks must touch DISJOINT stages,
    * and crash semantics rely on each stage's own manifest being its
    * commit record (any partially-published subset heals through the
    * caller's resume/retry path).
    */
  private def parallelRun(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.length == 1) return tasks.head()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.length)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val done = tasks.map(t => scala.concurrent.Future(t()))
        .map(f => scala.util.Try(scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf)))
      done.collectFirst { case scala.util.Failure(e) => throw e }
      (): Unit
    } finally pool.shutdown()
  }

  val Stages: Seq[String] =
    Seq("extract", "entities", "link_edges", "assign", "nodes", "edges")

  /** Stage-3 logic (shared by `run` and the oracle-checked
    * `kg_nodes_exact` query): canonical id per entity via connected
    * components over the link edges; singleton entities (no link edge)
    * canonicalize to themselves. Returns (assignments, cc iterations).
    */
  def assignCanonical(ents: DataFrame, links: DataFrame,
                      hotThreshold: Long = 100000L,
                      ccLocalThreshold: Long =
                        ConnectedComponents.LocalEdgeThreshold,
                      edgeCountHint: Option[Long] = None): (DataFrame, Int) = {
    val cc = ConnectedComponents.run(links, hotThreshold,
      localThreshold = ccLocalThreshold, edgeCountHint = edgeCountHint)
    val assign = cc.assignments.withColumnRenamed("id", "entityId")
    val out = ents.join(assign, Seq("entityId"), "left")
      .select(col("pred"), col("obj"), col("norm"), col("entityId"),
        coalesce(col("comp"), col("entityId")).as("canonicalId"))
    (out, cc.iterations)
  }

  /** Stage-4a logic: node table from canonical assignments. The
    * canonical surface form is the (norm, obj)-minimal member —
    * deterministic; kind is constant within a component (linking never
    * crosses preds).
    */
  def nodeTable(assign: DataFrame): DataFrame =
    nodeTableFull(assign)
      .select("canonicalId", "canonical", "kind", "memberCount")

  /** [[nodeTable]] plus `canonicalNorm` — the norm of the (norm, obj)-
    * minimal member. The SNAPSHOT keeps it because the min is only
    * recombinable across comp merges from the full argmin PAIR: an
    * incremental ingest rebuilds a merged component's node row from
    * the constituent rows' (canonicalNorm, canonical) structs without
    * touching member rows (min/min/sum are associative).
    */
  def nodeTableFull(assign: DataFrame): DataFrame =
    assign.groupBy("canonicalId")
      .agg(
        min(struct(col("norm"), col("obj"))).as("m"),
        min(col("pred")).as("kind"),
        count(lit(1)).as("memberCount"))
      .select(col("canonicalId"), col("m.obj").as("canonical"),
        col("m.norm").as("canonicalNorm"), col("kind"), col("memberCount"))

  def run(spark: SparkSession, files: Dataset[SourceFile], runDir: String,
          runId: String, cfg: Config = Config()): Result = {
    import spark.implicits._
    val resume = cfg.resume

    // a run dir that has received incremental ingests holds MULTIPLE
    // extract versions whose union is the corpus; run()'s resume path
    // reads only the latest (delta-only!) snapshot and would silently
    // rebuild the downstream graph from the last delta alone. Recovery
    // of a crashed ingest goes through runIncremental (idempotent per
    // runId), never through run().
    require(Snapshots.versions(runDir, "extract").length <= 1,
      s"$runDir has incremental extract versions — resume a crashed " +
        "ingest with runIncremental (same runId), or start a fresh runDir")

    // a recompute (resume=false) invalidates any pinned epoch the same
    // way a global relink does — the epoch state describes the
    // PREVIOUS run's entity set; drop it so a later pinned ingest
    // fails fast until pinEpoch re-freezes. A pure resume leaves the
    // (still-valid) epoch alone.
    if (!resume)
      Seq("ep_census", "ep_keys", "ep_shingles")
        .foreach(st => Snapshots.deleteDir(Snapshots.stageDir(runDir, st)))

    // Stage 1 — extraction. repartitionByRange(repo, path) gives
    // deterministic per-partition lineage and co-locates each repo's
    // files (north star verbatim).
    // Extract-stage layout choices are write-cost choices at 10^12
    // files (all WriteProbe-measured):
    //  - subj ("repo/path") is derivable — dropped on write,
    //    re-derived on read (~15% fewer bytes, ~20% less write wall);
    //  - partitioned by the quarantine FLAG, not by pred: the only
    //    partition predicate the pipeline ever applies is
    //    quarantine-vs-not, and a boolean dynamic-partition sort is
    //    far cheaper than a 10-value one (19s vs 25s single-thread at
    //    200k files, and half the bytes — fewer files keep dictionary
    //    pages effective). Per-pred partitioning remains where it is
    //    user-facing semantics: the published nodes/edges tables.
    val raw0 = Snapshots.stage(spark, runDir, "extract", runId, resume,
      partitionBy = Seq("q")) {
      val arranged = files.repartitionByRange(
        cfg.arrangePartitions.getOrElse(
          files.sparkSession.sparkContext.defaultParallelism),
        $"repo", $"path")
      Extraction.extract(arranged, cfg.extraction).toDF()
        .withColumn("q", $"pred" === lit(Extraction.QuarantinePred))
        .drop("subj")
    }
    val raw = raw0.withColumn("subj", concat($"repo", lit("/"), $"path"))

    // q partition pruning: these scans never touch quarantine rows.
    // The partition column is WRITTEN as boolean but read back as
    // STRING (partition inference never infers booleans) — cast
    // explicitly rather than leaning on implicit string→boolean
    // coercion surviving ANSI rule changes.
    val triples = raw.filter(!$"q".cast("boolean")).drop("q")

    val ccIters = downstream(spark, runDir, runId, cfg, triples, resume)
    resultFrom(runDir, runId, ccIters)
  }

  /** Incremental ingest: extract ONLY `newFiles` (the content scan —
    * the cost that dominates at 10^12 files — never re-reads old
    * corpus bytes) as a NEW version of the extract snapshot, then
    * recompute the narrow downstream stages (entities, link edges,
    * canonicalization, node/edge tables — ~1% of the corpus bytes)
    * over the union of every extract version. Each ingest version-
    * bumps every stage snapshot, so prior graph states stay
    * time-travelable ([[graft.store.Snapshots.readVersion]]) and the
    * published tables are always globally consistent — a new form CAN
    * merge two previously-separate entities, which no edge-append
    * scheme would capture.
    *
    * Why the relink is global rather than delta-vs-all candidates +
    * stored old edges: the stop-shingle census is corpus-dependent
    * (the cap scales with the fuzzy population,
    * [[graft.link.Linking.Config.stopShingleCap]]), so growing the
    * corpus changes which shingles block for OLD pairs too — a
    * candidate-incremental scheme would not be output-equal to a
    * from-scratch run, just close. Global relink buys exact equality
    * (spec-gated) for the cost of recomputing narrow tables.
    *
    * Output equality with a from-scratch run over the full corpus is
    * spec-gated (PipelineSpec): incremental(A) + incremental(B) ≡
    * full(A ∪ B) on nodes, edges, and counts.
    */
  def runIncremental(spark: SparkSession, newFiles: Dataset[SourceFile],
                     runDir: String, runId: String,
                     cfg: Config = Config()): Result = {
    import spark.implicits._
    require(Snapshots.isComplete(runDir, "extract"),
      s"no completed prior run in $runDir — use Pipeline.run for the first ingest")

    extractDeltaOnce(spark, newFiles, runDir, runId, cfg)

    // a global relink is an EPOCH BUMP: any pinned epoch state derives
    // from the pre-ingest corpus and is stale the moment entities /
    // link_edges are globally recomputed — drop it so a later
    // runIncrementalPinned fails fast until pinEpoch re-freezes
    Seq("ep_census", "ep_keys", "ep_shingles")
      .foreach(st => Snapshots.deleteDir(Snapshots.stageDir(runDir, st)))

    // full triple set = union of every ingest's extract snapshot
    val allRaw = Snapshots.versions(runDir, "extract")
      .map(v => Snapshots.readVersion(spark, runDir, "extract", v))
      .reduce(_ unionByName _)
      .withColumn("subj", concat($"repo", lit("/"), $"path"))
    val triples = allRaw.filter(!$"q".cast("boolean")).drop("q")

    val ccIters = downstream(spark, runDir, runId, cfg, triples,
      resume = false)
    resultFrom(runDir, runId, ccIters)
  }

  /** Delta-only extract as a new snapshot version — UNLESS a version
    * with this runId already exists: a retry after a crash during the
    * downstream stages must not append the same delta twice (the
    * version union would double-count its triples). Idempotence key =
    * the caller's runId, same contract as Streaming.ingestBatch.
    */
  private def extractDeltaOnce(spark: SparkSession,
                               newFiles: Dataset[SourceFile],
                               runDir: String, runId: String,
                               cfg: Config): Unit = {
    import spark.implicits._
    val alreadyExtracted = Snapshots.versions(runDir, "extract")
      .exists(v => Snapshots.readManifestVersion(runDir, "extract", v)
        .runId == runId)
    if (!alreadyExtracted) {
      Snapshots.stage(spark, runDir, "extract", runId, resume = false,
        partitionBy = Seq("q")) {
        val arranged = newFiles.repartitionByRange(
          cfg.arrangePartitions.getOrElse(
            newFiles.sparkSession.sparkContext.defaultParallelism),
          $"repo", $"path")
        Extraction.extract(arranged, cfg.extraction).toDF()
          .withColumn("q", $"pred" === lit(Extraction.QuarantinePred))
          .drop("subj")
      }
      (): Unit
    }
  }

  // ------------------------------------------------------------------
  // EPOCH-PINNED incremental linking. runIncremental's global relink
  // buys exact from-scratch equality at the cost of recomputing the
  // narrow tables per ingest — at daily ingests over 10^12 files the
  // relink, not the extract, becomes THE cost (the stop-shingle
  // census, shingling, banding, and candidate scoring all rescan the
  // corpus). An EPOCH freezes the census (Linking.Config.pinnedHot)
  // and stores the shingle + banded-key tables as appendable
  // snapshots; each ingest then:
  //   - extracts ONLY the delta (as before),
  //   - appends the delta's new entity forms / shingles / band keys,
  //   - links DELTA-vs-ALL under the pinned census (the stored narrow
  //     tables are broadcast-filtered SCANS — never reshuffled, never
  //     re-shingled) and appends the new edges,
  //   - recomputes only CC + the node/edge materialization (narrow).
  // Contract: the maintained graph equals a from-scratch run UNDER THE
  // PINNED CENSUS (spec-gated in PipelineSpec), PROVIDED no band
  // bucket exceeds Linking.Config.maxBandBucket — above that the
  // from-scratch comparator star-restructures the bucket while the
  // delta path scores delta-vs-all, a SUPERSET of true merges (see
  // Linking.deltaFuzzyEdges's equality-scope note). Equality to an
  // unpinned from-scratch run is deliberately NOT promised — the
  // census is corpus-dependent, which is exactly why runIncremental
  // relinks globally. Re-pin (epoch bump) by running a global
  // runIncremental (which drops the epoch state) + pinEpoch when the
  // corpus has grown enough that the frozen census is stale (rule of
  // thumb: fuzzy population grew past the pinned cap's headroom,
  // i.e. ~2× the pinned nFuzzy).
  // ------------------------------------------------------------------

  /** Freeze the linking environment of the CURRENT global state as an
    * epoch: the stop-shingle census (ep_census), the shingle table
    * (ep_shingles), and the banded key table (ep_keys), each a
    * versioned snapshot under the run dir. Call after Pipeline.run or
    * a global runIncremental.
    *
    * Re-pinning over a dir whose link_edges lineage already carries
    * delta appends BLENDS censuses (old edges were scored under the
    * previous census) — still precision-1.0 (every edge is an exact
    * Jaccard ≥ threshold), but the spec'd from-scratch-under-census
    * equality only holds for epochs pinned right after a GLOBAL
    * relink. The crash-heal path in Streaming.ingestBatch accepts the
    * blend deliberately (availability over the recall fine print).
    */
  def pinEpoch(spark: SparkSession, runDir: String, runId: String,
               cfg: Config = Config()): Unit = {
    import spark.implicits._
    require(Snapshots.isComplete(runDir, "entities"),
      s"no completed run in $runDir — pinEpoch freezes an existing graph")
    val fuzzy = lineageUnion(spark, runDir, "entities")
      .filter(col("pred").isin(Linking.FuzzyPreds: _*))
    // cap from the entity manifest rows — the SAME n convention the
    // global link stage uses (sizeHint = entities manifest rows), so
    // an epoch pinned right after a global run freezes EXACTLY the
    // census that run linked under (pinned-vs-base coherence; an
    // upper bound only raises the cap, same contract as linkEdges)
    val nEnts = lineageVersions(runDir, "entities").map(v =>
      Snapshots.readManifestVersion(runDir, "entities", v).rows).sum
    val cap = cfg.link.stopShingleCap(nEnts)
    val shingled = Snapshots.stage(spark, runDir, "ep_shingles", runId,
      resume = false, metrics = Map("delta" -> "false")) {
      Linking.shingleTable(fuzzy, cfg.link)
    }
    val hot = Linking.hotShingles(shingled, cap)
    // ep_census and ep_keys both derive from (shingled, hot) and
    // publish disjoint stages — overlap the two publishes (same crash
    // contract as the other concurrent publishes: each stage's own
    // manifest is the commit record)
    parallelRun(Seq(
      () => {
        Snapshots.stage(spark, runDir, "ep_census", runId, resume = false,
          metrics = Map("cap" -> cap.toString, "nEnts" -> nEnts.toString)) {
          hot.toDF("pred", "sh")
        }
        (): Unit
      },
      () => {
        Snapshots.stage(spark, runDir, "ep_keys", runId, resume = false,
          metrics = Map("delta" -> "false")) {
          Linking.bandedKeyTable(shingled, cfg.link, hot)
        }
        (): Unit
      }))
  }

  /** The frozen census of the current epoch. An empty census (no
    * fuzzy entities at pin time — manifest rows 0) short-circuits
    * without a collect job: per-ingest fixed cost, not data.
    */
  private def pinnedHot(spark: SparkSession,
                        runDir: String): Seq[(String, Long)] =
    if (Snapshots.readManifest(runDir, "ep_census").rows == 0L) Nil
    else Snapshots.read(spark, runDir, "ep_census")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Epoch-incremental ingest: delta-only extract AND delta-only
    * linking under the pinned census (see the block comment above).
    * Idempotent per runId at every appended stage, like
    * [[runIncremental]].
    */
  def runIncrementalPinned(spark: SparkSession,
                           newFiles: Dataset[SourceFile],
                           runDir: String, runId: String,
                           cfg: Config = Config()): Result = {
    import spark.implicits._
    require(Snapshots.isComplete(runDir, "extract"),
      s"no completed prior run in $runDir — use Pipeline.run for the first ingest")
    Seq("ep_census", "ep_shingles", "ep_keys").foreach(st =>
      require(Snapshots.isComplete(runDir, st),
        s"no pinned epoch in $runDir — run Pipeline.pinEpoch first"))

    // lineage maintenance BEFORE this ingest appends anything: only
    // completed foreign runs consolidate (see compactLineage)
    cfg.maxLineageDeltas.foreach(compactLineage(spark, runDir, runId, _))

    // 1. delta-only extract (idempotent per runId)
    graft.store.IOStat.timed("pin.extract")(
      extractDeltaOnce(spark, newFiles, runDir, runId, cfg))
    val myV = Snapshots.versions(runDir, "extract").find(v =>
      Snapshots.readManifestVersion(runDir, "extract", v).runId == runId).get
    val deltaTriples = Snapshots
      .readVersion(spark, runDir, "extract", myV)
      .filter(!$"q".cast("boolean")).drop("q")

    // "the world before this ingest": lineage versions excluding any
    // slice a crashed attempt of THIS runId already appended
    def oldUnion(stage: String): DataFrame = lineageUnion(spark, runDir,
      stage, excludeRunId = Some(runId))

    // 2. delta entity forms — distinct forms of the delta not already
    // in the stored entity table (which is only scanned: the delta's
    // ids broadcast into the probe, the survivors anti-join a tiny
    // set). Broadcast hints only while the delta is small (bounded by
    // the delta extract's manifest rows); an epoch-sized delta
    // degrades to AQE-planned joins instead of blowing the driver.
    val deltaExtractRows =
      Snapshots.readManifestVersion(runDir, "extract", myV).rows
    def hinted(df: DataFrame): DataFrame =
      if (deltaExtractRows <= SkewJoin.BroadcastableRightRows) broadcast(df)
      else df
    val entsOld = oldUnion("entities")
    val newEnts = graft.store.IOStat.timed("pin.entities")(
      appendOnce(spark, runDir, "entities", runId) {
      val deltaForms = Linking.entitiesOf(deltaTriples)
      val existing = entsOld
        .join(hinted(deltaForms.select("entityId")), Seq("entityId"))
        .select("entityId").distinct()
      deltaForms.join(hinted(existing), Seq("entityId"), "left_anti")
    })

    // 3. delta shingles + band keys under the PINNED census
    val hot = pinnedHot(spark, runDir)
    val deltaShingled = graft.store.IOStat.timed("pin.shingles")(
      appendOnce(spark, runDir, "ep_shingles", runId) {
        Linking.shingleTable(
          newEnts.filter(col("pred").isin(Linking.FuzzyPreds: _*)), cfg.link)
      })

    // 3b. CENSUS DRIFT — what the frozen epoch is silently costing:
    // of the delta's distinct (pred, shingle) keys, the fraction whose
    // hot/stop classification DIFFERS between the pinned census and a
    // fresh census at the current corpus size (fresh cap = the cap a
    // global relink would use right now). A drifted-to-hot shingle
    // still blocks for the delta (extra candidates — cost, not
    // recall); a drifted-to-stop one means the pin keeps surfacing
    // candidates a fresh run would drop. Exact per-shingle dfs come
    // from one broadcast-filtered scan of the stored shingle lineage
    // (delta-bounded aggregate, map-side combined); Config.driftSample
    // trades that scan for a sampled estimate at extreme scale. The
    // metric lands in this ingest's ep_keys manifest; Config.
    // maxCensusDrift turns it into a refusal (recover by running the
    // SAME runId through runIncremental — the global relink, which
    // bumps the epoch — then pinEpoch).
    val tDrift0 = System.nanoTime()
    // an ingest with NO fuzzy delta shingles has drift 0 by definition
    // (the measured set is empty) — known for free from the slice's
    // manifest, so the measurement jobs are skipped outright instead
    // of aggregating empty frames
    val deltaShRows = deltaRowsOf(runDir, "ep_shingles", runId)
    val drift =
      if (deltaShRows == 0L) 0.0
      else censusDrift(spark, runDir, cfg, hot, deltaShingled,
        deltaExtractRows)
    val driftSec = (System.nanoTime() - tDrift0) / 1e9
    cfg.maxCensusDrift.foreach { th =>
      require(drift <= th,
        f"census drift $drift%.4f exceeds maxCensusDrift $th%.4f — the " +
          s"pinned epoch is stale; re-pin: runIncremental(runId=$runId) " +
          "(global relink, bumps the epoch) then pinEpoch")
    }

    val deltaKeys = graft.store.IOStat.timed("pin.keys")(
      appendOnce(spark, runDir, "ep_keys", runId,
        Map("censusDrift" -> f"$drift%.6f",
          "driftSec" -> f"$driftSec%.2f")) {
        Linking.bandedKeyTable(deltaShingled, cfg.link, hot)
      })
    val deltaKeyRows = deltaRowsOf(runDir, "ep_keys", runId)

    // 4. new edges = delta-vs-all (exact-norm + banded fuzzy), each
    // pair carrying >=1 delta endpoint — disjoint from stored edges
    val deltaLinks = graft.store.IOStat.timed("pin.links")(
      appendOnce(spark, runDir, "link_edges", runId) {
        val keysAll = lineageUnion(spark, runDir, "ep_keys")
        val shingledAll = lineageUnion(spark, runDir, "ep_shingles")
        Linking.deltaExactEdges(entsOld, newEnts, deltaExtractRows)
          .unionByName(Linking.deltaFuzzyEdges(deltaKeys, keysAll,
            shingledAll, cfg.link, deltaKeyRows))
      })
    val deltaLinkRows = deltaRowsOf(runDir, "link_edges", runId)

    // 5. canonicalize + materialize: O(delta) bucket patches when the
    // layout and bounds allow (see incrementalCanonicalize), else the
    // global tail over the full (narrow) unions
    val ccIters = graft.store.IOStat.timed("pin.canon")(
      incrementalCanonicalize(spark, runDir, runId, cfg,
        deltaTriples, newEnts, deltaLinks, deltaLinkRows, deltaExtractRows))
      .getOrElse {
        val allTriples = Snapshots.versions(runDir, "extract")
          .map(v => Snapshots.readVersion(spark, runDir, "extract", v))
          .reduce(_ unionByName _)
          .withColumn("subj", concat($"repo", lit("/"), $"path"))
          .filter(!$"q".cast("boolean")).drop("q")
        canonicalize(spark, runDir, runId, cfg, allTriples,
          lineageUnion(spark, runDir, "entities"),
          lineageUnion(spark, runDir, "link_edges"), resume = false)
      }
    resultFrom(runDir, runId, ccIters)
  }

  // ------------------------------------------------------------------
  // O(delta) canonicalize tail. The pinned path above made extraction
  // and linking delta-proportional, but a global CC + full rewrite of
  // assign/nodes/edges per ingest reads AND writes the whole corpus —
  // at daily ingests over 10^12 files that tail IS the cost. The
  // observation that makes it incremental: delta link edges can only
  //   (a) land inside one existing component — a no-op, or
  //   (b) MERGE components — and the set of touched components is
  //       bounded by the delta edge count.
  // So: resolve the delta edges' endpoints to their current canonical
  // ids (ONE broadcast-filtered narrow scan of the stored assign
  // table — the same probe-scan shape as the stored-key scans above),
  // union-find the resulting component-pair graph ON THE DRIVER
  // (bounded by the delta, same driver-capacity contract as
  // ConnectedComponents' local fast path), then publish COPY-ON-WRITE
  // PATCHES (Snapshots.stagePatch) that rewrite only the cb buckets
  // whose components changed:
  //   assign — rewrite buckets of merged-away roots (their member
  //            rows remap to the new root and leave the bucket);
  //            append the delta entities' rows;
  //   nodes  — rewrite buckets of every old root in the pair graph
  //            (absorbed rows vanish, absorbing rows recombine);
  //            merged rows rebuild from the constituent node rows'
  //            (canonicalNorm, canonical) argmin structs + the delta
  //            members' aggregate — min/min/sum are associative, so
  //            NO member rows are read;
  //   edges  — rewrite buckets of merged-away roots (remap
  //            canonicalId); append the delta triples' edges.
  // Per-ingest IO = |touched buckets| × corpus/B reads + delta-sized
  // writes; Config.canonBuckets is the knob that holds bucket size
  // flat as the corpus grows. Equality with the global tail is
  // spec-gated (PipelineSpec) and the path is oracle-gated end to end
  // (kg_nodes_pinned).
  // ------------------------------------------------------------------

  /** Returns Some(ccIterations=0) when the incremental tail ran, None
    * when the caller must fall back to the global tail: canonBuckets
    * unset or mismatched with the stored layout, delta beyond the
    * driver/broadcast bounds, or a crash-retry that finds the three
    * tail stages PARTIALLY patched by this runId (the pair graph can
    * only be derived from the pre-patch assign, so a half-applied
    * ingest recovers through the global tail — correct, just not
    * O(delta)). A FULLY patched retry is a no-op (idempotent per
    * runId, like every appended stage).
    */
  private def incrementalCanonicalize(spark: SparkSession, runDir: String,
                                      runId: String, cfg: Config,
                                      deltaTriples: DataFrame,
                                      newEnts: DataFrame,
                                      deltaLinks: DataFrame,
                                      deltaLinkRows: Long,
                                      deltaExtractRows: Long): Option[Int] = {
    import spark.implicits._
    val Tail = Seq("assign", "nodes", "edges")
    val b = cfg.canonBuckets match {
      case Some(v) if cfg.incrementalCanon => v
      case _ => return None
    }
    // a tail stage whose live manifest is missing (crash window) can
    // only be healed by the global tail; and the stored layout must
    // carry the SAME bucketing (cb is baked into the partition dirs)
    if (!Tail.forall(st => Snapshots.isComplete(runDir, st))) return None
    if (!Tail.forall(st => Snapshots.readManifest(runDir, st)
      .metrics.get("canonBuckets").contains(b.toString))) return None
    // bounds: the probe set, delta maps, and pair graph all ride the
    // driver/broadcast — the same capacity contracts as the rest of
    // the pinned path (BroadcastableRightRows) and the CC fast path
    // (ccLocalThreshold)
    if (deltaExtractRows > SkewJoin.BroadcastableRightRows ||
      deltaLinkRows > cfg.ccLocalThreshold) return None
    val deferred = cfg.deferMerges
    val hadDirtyLog = canonLogDirty(runDir)
    // a dirty canon log means stored canonicals are stale: the
    // copy-on-write patch tail would bake the staleness into rewritten
    // buckets — only the deferred tail (which resolves through the
    // log) or the global tail (which recomputes from source and
    // clears it) may run
    if (hadDirtyLog && !deferred) return None
    val prevLog: Map[Long, Long] =
      if (deferred) canonLogMap(spark, runDir) else Map.empty
    if (prevLog.size > cfg.ccLocalThreshold) return None
    // crash-retry idempotence. In deferred mode the canon log is
    // published LAST and acts as the ingest's commit record — a
    // crash anywhere before it leaves a PARTIAL application, healed
    // by the global tail exactly like a half-patched CoW ingest.
    val done = Tail.map(st =>
      Snapshots.readManifest(runDir, st).runId == runId) ++
      (if (deferred) Seq(Snapshots.isComplete(runDir, CanonLogStage) &&
        Snapshots.readManifest(runDir, CanonLogStage).runId == runId)
      else Nil)
    if (done.forall(identity)) return Some(0)
    if (done.exists(identity)) return None

    def bucketOf(id: Long): Int = (((id % b) + b) % b).toInt

    // --- 1. ONE narrow probe of the stored assign table, pruned to
    // the ident=false partitions: current canonical of every delta
    // edge endpoint and every old form the delta triples re-mention.
    // Identity rows (canonicalId == entityId — the overwhelming
    // majority of the corpus) carry nothing the probe can't infer:
    // every consumer defaults a missing id to canonical = itself, so
    // scanning them only ever confirmed that default. The one thing
    // the full scan additionally established — does this endpoint
    // EXIST in the stored corpus, i.e. should a merge remap STORED
    // rows (oldRoots) or only delta rows (deltaMoved)? — is answered
    // exactly by newEnts: extraction anti-joined duplicates away, so
    // delta ids are disjoint from stored ids, and "old" = "not in
    // newEnts". Probe IO is therefore O(non-identity rows), i.e.
    // proportional to merge density, not corpus size.
    var tProbe = 0L; var tUf = 0L
    def timing[T](acc: Long => Unit)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      acc(System.nanoTime() - t0); r
    }
    val assignOld = Snapshots.read(spark, runDir, "assign")
    // triple ids and edge-endpoint ids in ONE collect (tagged union +
    // groupBy instead of two distinct+collect jobs — the probe is
    // per-ingest fixed cost)
    val tagged = timing(tProbe += _)(deltaTriples
      .select(Linking.idCol($"pred", $"obj").as("id"), lit(true).as("t"))
      .unionByName(deltaLinks.select($"src".as("id"), lit(false).as("t")))
      .unionByName(deltaLinks.select($"dst".as("id"), lit(false).as("t")))
      .groupBy($"id").agg(max($"t").as("t"))
      .as[(Long, Boolean)].collect())
    val tripleIds = tagged.collect { case (id, true) => id }
    val needed = tagged.map(_._1)
    // delta entity ids (bounded by the deltaExtractRows guard above)
    val newIds = scala.collection.mutable.LongMap.empty[Unit]
    timing(tProbe += _)(newEnts.select($"entityId").distinct()
      .as[Long].collect().foreach(newIds(_) = ()))
    val oldCanon = scala.collection.mutable.LongMap.empty[Long]
    timing(tProbe += _)(assignOld
      .filter(!$"ident".cast("boolean")) // partition-pruned slice
      .select($"entityId", $"canonicalId")
      .join(broadcast(needed.toSeq.toDF("entityId")), Seq("entityId"))
      .as[(Long, Long)].collect()
      .foreach { case (e, c) => oldCanon(e) = c })

    // --- 2. driver union-find over the component-pair graph (min-id
    // roots — identical semantics to both ConnectedComponents paths)
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val oldRoots = scala.collection.mutable.LongMap.empty[Unit]
    val touched = scala.collection.mutable.LongMap.empty[Unit]
    // old endpoints (not in newIds) resolve through the probed
    // non-identity map, defaulting to canonical = self — identity
    // rows were pruned from the probe precisely because this default
    // reconstructs them. Their canonical is an OLD root either way:
    // a merge must remap stored rows, not just delta appends.
    // stored canonicals resolve through the dirty canon log (deferred
    // mode: prior merges were recorded, not rewritten — the stored
    // value may be a merged-away root)
    def resolve(c: Long): Long = prevLog.getOrElse(c, c)
    def rep(e: Long): Long =
      if (newIds.contains(e)) e
      else {
        val c = resolve(oldCanon.getOrElse(e, e)); oldRoots(c) = (); c
      }
    timing(tUf += _)(deltaLinks.select($"src", $"dst").as[(Long, Long)]
      .mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { case (a, x) => buf += a; buf += x }
        Iterator.single(buf.result())
      }.collect().foreach { arr =>
        var i = 0
        while (i < arr.length) {
          val ra = find(rep(arr(i))); val rb = find(rep(arr(i + 1)))
          if (ra != rb) {
            parent(math.max(ra, rb)) = math.min(ra, rb)
            touched(ra) = (); touched(rb) = ()
          }
          i += 2
        }
      })
    // roots that actually merged (vs. delta edges that landed inside
    // one existing component — no-ops)
    val mergedOldRoots = touched.keysIterator
      .filter(r => oldRoots.contains(r) && find(r) != r).toArray
    val changedOldRoots = touched.keysIterator
      .filter(oldRoots.contains).toArray // absorbed OR absorbing
    val deltaMoved = touched.keysIterator
      .filterNot(oldRoots.contains).toArray // delta ids in real merges

    // --- 3. driver-bounded maps shipped back as broadcast frames
    val rootMapDf = mergedOldRoots.toSeq
      .map(r => (r, find(r))).toDF("canonicalId", "newCanon")
    val deltaCompDf = deltaMoved.toSeq
      .map(d => (d, find(d))).filter { case (d, f) => f != d }
      .toDF("entityId", "comp")
    // final canonical of every distinct delta-triple form (old forms:
    // stored canonical, then through the root remap; new forms: their
    // union-find root or themselves)
    val finalCanonDf = tripleIds.toSeq.map { id =>
      (id, find(resolve(oldCanon.getOrElse(id, id))))
    }.toDF("entityId", "fc")

    val cbOf = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(b.toLong)).cast("int")
    def dirs(roots: Array[Long]): Seq[String] =
      roots.map(bucketOf).distinct.toSeq.map(v => s"cb=$v")
    def buckets(roots: Array[Long]): Seq[Int] =
      roots.map(bucketOf).distinct.toSeq
    // delta appends sized by rows (~4M narrow rows per file):
    // repartition(1) would funnel a large delta into one giant
    // single-task file at real ingest sizes
    val appendParts = math.min(64L,
      math.max(1L, deltaExtractRows / 4000000L)).toInt
    def tailMetrics = Map(
      "canonBuckets" -> b.toString,
      "ccIterations" -> "0",
      "merges" -> mergedOldRoots.length.toString,
      "probeSec" -> f"${tProbe / 1e9}%.2f",
      "ufSec" -> f"${tUf / 1e9}%.2f",
      "delta" -> "patch")

    // delta frames SHARED by both tails (one source of truth for the
    // canonical-assignment semantics — the deferred and CoW graphs
    // must never diverge): every delta entity row with its final
    // canonical, and every delta triple resolved to its final edge
    val deltaAssign = newEnts
      .join(broadcast(deltaCompDf), Seq("entityId"), "left")
      .select($"pred", $"obj", $"norm", $"entityId",
        coalesce($"comp", $"entityId").as("canonicalId"))
    val deltaE = deltaTriples
      .withColumn("subj", concat($"repo", lit("/"), $"path"))
      .withColumn("entityId", Linking.idCol($"pred", $"obj"))
      .join(broadcast(finalCanonDf), Seq("entityId"), "left")
      .select($"subj", $"pred",
        coalesce($"fc", $"entityId").as("canonicalId"),
        $"conf", $"repo", $"path", $"commit")

    // --- DEFERRED TAIL (Config.deferMerges): merge-on-read. No
    // bucket rewrite at all — the three tables take O(delta)
    // append-only patches and this ingest's merges are RECORDED in
    // the compressed canon log instead of applied. Readers resolve
    // (readNodes/readEdges); compactTail applies the log physically
    // past the threshold. The log publishes LAST as the ingest's
    // commit record (see the done-check above).
    if (deferred) {
      val assignApp = deltaAssign
        .withColumn("ident",
          ($"canonicalId" === $"entityId").cast("string"))
        .withColumn("cb", cbOf($"canonicalId"))
        .repartition(appendParts).sortWithinPartitions($"cb")
      val nodesApp = deltaAssign.groupBy($"canonicalId")
        .agg(min(struct($"norm", $"obj")).as("m"),
          min($"pred").as("kind"), count(lit(1)).as("memberCount"))
        .select($"canonicalId", $"m.obj".as("canonical"),
          $"m.norm".as("canonicalNorm"), $"kind", $"memberCount")
        .withColumn("cb", cbOf($"canonicalId"))
        .repartition(appendParts).sortWithinPartitions($"cb", $"kind")
      val edgesApp = deltaE
        .withColumn("cb", cbOf($"canonicalId"))
        .repartition(appendParts).sortWithinPartitions($"cb", $"pred")

      // captured BEFORE the appends publish: the live nodes manifest
      // is about to gain this delta's constituent rows
      val prevLogical =
        if (hadDirtyLog)
          Snapshots.readManifest(runDir, CanonLogStage)
            .metrics("logicalNodes").toLong
        else Snapshots.readManifest(runDir, "nodes").rows

      def appendOnly(st: String, partBy: Seq[String],
                     app: DataFrame): Unit =
        Snapshots.stagePatch(spark, runDir, st, runId, Nil, partBy,
          tailMetrics + ("defer" -> "true")) {
          app.filter(lit(false))
        } { app }

      parallelRun(Seq(
        () => appendOnly("assign", Seq("ident", "cb"), assignApp),
        () => appendOnly("nodes", Seq("cb"), nodesApp),
        () => appendOnly("edges", Seq("cb"), edgesApp)))

      // compressed single-hop: prior targets re-resolve through this
      // ingest's union-find, so a reader never follows a chain
      val fullLog = prevLog.map { case (k, v) => (k, find(v)) } ++
        mergedOldRoots.map(r => (r, find(r)))
      // logical node count by driver arithmetic (stored node ROWS
      // over-count merged components until the next fold): previous
      // logical count, plus delta components that created a NEW root,
      // minus old roots merged away
      val newDeltaRoots = {
        val seen = scala.collection.mutable.LongMap.empty[Unit]
        newIds.keysIterator.foreach { e =>
          val r = find(e); if (newIds.contains(r)) seen(r) = ()
        }
        seen.size
      }
      val logical = prevLogical + newDeltaRoots - mergedOldRoots.length
      Snapshots.stage(spark, runDir, CanonLogStage, runId,
        resume = false,
        metrics = tailMetrics ++ Map("dirty" -> "true",
          "logicalNodes" -> logical.toString)) {
        fullLog.toSeq.toDF("oldRoot", "newRoot").coalesce(1)
      }
      cfg.compactAppendFrac.foreach(compactTail(spark, runDir, runId, _))
      return Some(0)
    }

    // --- 4. assign patch: member rows of merged-away roots remap (and
    // leave their bucket — those buckets rewrite); delta entity rows
    // append wherever their canonical lands
    val aBuckets = buckets(mergedOldRoots)
    // patch writes: rewritten buckets repartition on the dir columns
    // (files ≈ rewritten dirs, not tasks × dirs); everything landing
    // OUTSIDE a rewritten bucket — delta entities hash anywhere —
    // goes to the snapshot's unpartitioned append set (see
    // Snapshots.stagePatch: one file set per ingest instead of ~B
    // scattered dir touches, which measured as THE dominant patch
    // cost). Partition columns in the append set carry the
    // READ-BACK types (ident: string, cb: int).
    def inRew(buckets: Seq[Int]) =
      if (buckets.isEmpty) lit(false) else $"cb".isin(buckets: _*)
    def assignContent = {
      val oldRows = assignOld
        .filter(inRew(aBuckets))
        .select($"pred", $"obj", $"norm", $"entityId", $"canonicalId")
      val remapped = oldRows
        .join(broadcast(rootMapDf), Seq("canonicalId"), "left")
        .select($"pred", $"obj", $"norm", $"entityId",
          coalesce($"newCanon", $"canonicalId").as("canonicalId"))
      remapped.unionByName(deltaAssign)
        .withColumn("ident",
          ($"canonicalId" === $"entityId").cast("string"))
        .withColumn("cb", cbOf($"canonicalId"))
    }
    def patchAssign(): Unit =
      Snapshots.stagePatch(spark, runDir, "assign", runId,
        dirs(mergedOldRoots), Seq("ident", "cb"), tailMetrics) {
        assignContent.filter(inRew(aBuckets)).repartition($"ident", $"cb")
      } {
        assignContent.filter(!inRew(aBuckets))
          .repartition(appendParts).sortWithinPartitions($"cb")
      }

    // --- 5. nodes patch: every old root in a real merge loses or
    // recombines its row; merged rows rebuild from the constituent
    // rows + the delta members' aggregate (no member rows read)
    val nodesOld = Snapshots.read(spark, runDir, "nodes")
    val nBuckets = buckets(changedOldRoots)
    val changedDf = changedOldRoots.toSeq
      .map(r => (r, find(r))).toDF("canonicalId", "fRoot")
    def nodesContent = {
      val pruned = nodesOld
        .filter(inRew(nBuckets))
        .select($"canonicalId", $"canonical", $"canonicalNorm", $"kind",
          $"memberCount")
      val keep = pruned
        .join(broadcast(changedDf.select($"canonicalId")), Seq("canonicalId"),
          "left_anti")
      val oldContrib = pruned
        .join(broadcast(changedDf), Seq("canonicalId"))
        .select($"fRoot".as("canonicalId"),
          struct($"canonicalNorm".as("norm"), $"canonical".as("obj")).as("m"),
          $"kind", $"memberCount")
      val deltaContrib = deltaAssign.groupBy($"canonicalId")
        .agg(min(struct($"norm", $"obj")).as("m"),
          min($"pred").as("kind"), count(lit(1)).as("memberCount"))
      val combined = oldContrib.unionByName(deltaContrib)
        .groupBy($"canonicalId")
        .agg(min($"m").as("m"), min($"kind").as("kind"),
          sum($"memberCount").as("memberCount"))
        .select($"canonicalId", $"m.obj".as("canonical"),
          $"m.norm".as("canonicalNorm"), $"kind", $"memberCount")
      keep.unionByName(combined).withColumn("cb", cbOf($"canonicalId"))
    }
    def patchNodes(): Unit =
      Snapshots.stagePatch(spark, runDir, "nodes", runId,
        dirs(changedOldRoots), Seq("cb"), tailMetrics) {
        nodesContent.filter(inRew(nBuckets))
          .repartition($"cb").sortWithinPartitions($"cb", $"kind")
      } {
        nodesContent.filter(!inRew(nBuckets))
          .repartition(appendParts).sortWithinPartitions($"cb", $"kind")
      }

    // --- 6. edges patch: stored edge rows change ONLY when their
    // canonicalId was a merged-away root (absorbing roots keep their
    // id); the delta's own triples append
    val edgesOld = Snapshots.read(spark, runDir, "edges")
    def edgesContent = {
      val pruned = edgesOld
        .filter(inRew(aBuckets))
        .select($"subj", $"pred", $"canonicalId", $"conf", $"repo",
          $"path", $"commit")
      val remapped = pruned
        .join(broadcast(rootMapDf), Seq("canonicalId"), "left")
        .select($"subj", $"pred",
          coalesce($"newCanon", $"canonicalId").as("canonicalId"),
          $"conf", $"repo", $"path", $"commit")
      remapped.unionByName(deltaE).withColumn("cb", cbOf($"canonicalId"))
    }
    def patchEdges(): Unit =
      Snapshots.stagePatch(spark, runDir, "edges", runId,
        dirs(mergedOldRoots), Seq("cb"), tailMetrics) {
        edgesContent.filter(inRew(aBuckets))
          .repartition($"cb").sortWithinPartitions($"cb", $"pred")
      } {
        edgesContent.filter(!inRew(aBuckets))
          .repartition(appendParts).sortWithinPartitions($"cb", $"pred")
      }

    // --- 7. publish the three patches CONCURRENTLY: each touches
    // ONLY its own stage (the pre-patch frames above were assembled
    // from the pre-patch manifests, pinned to their file lists), so
    // the three narrow publish jobs overlap instead of serializing
    // three rounds of write + commit + footer latency — the dominant
    // term of the O(delta) tail once the data is delta-sized. Crash
    // semantics are unchanged: ANY partially-patched subset (now any
    // of 2^3 - 2 instead of a prefix) is caught by the
    // `done.exists(identity)` guard above and heals through the
    // global tail. Each future is awaited — a failure propagates
    // only after all three publishes finished or failed, so no write
    // is still in flight when the caller sees the error.
    parallelRun(Seq(
      () => patchAssign(), () => patchNodes(), () => patchEdges()))
    cfg.compactAppendFrac.foreach(compactTail(spark, runDir, runId, _))
    Some(0)
  }

  /** Append maintenance for the patched tail tables (see
    * Config.compactAppendFrac): fold any of assign/nodes/edges whose
    * net append rows exceed `frac` of the table into a fresh full
    * snapshot, re-clustered the way the full-run publishes cluster
    * them. Idempotent per runId (a crash between folds re-runs only
    * the stages still over threshold; a re-run after all folds is a
    * no-op). Returns the stages folded.
    */
  def compactTail(spark: SparkSession, runDir: String, runId: String,
                  frac: Double): Seq[String] = {
    import org.apache.spark.sql.DataFrame
    val stages = Seq("assign", "nodes", "edges")
    if (!stages.forall(Snapshots.isComplete(runDir, _))) return Nil
    val dirty = canonLogDirty(runDir)
    def over(st: String): Boolean = {
      val m = Snapshots.readManifest(runDir, st)
      val (appendRows, _) = Snapshots.appendStats(m)
      m.rows > 0 && appendRows.toDouble / m.rows >= frac
    }
    // the dirty log is read-tax mass too: it broadcasts into every
    // resolving read, so it counts toward the trigger
    val logOver = dirty && {
      val lm = Snapshots.readManifest(runDir, CanonLogStage)
      val am = Snapshots.readManifest(runDir, "assign")
      am.rows > 0 && lm.rows.toDouble / am.rows >= frac
    }
    // deferred mode folds ALL-OR-NOTHING: applying the log to one
    // table while the others stay log-resolved would mix canonical
    // spaces. (A crash between the folds and the log-clear below is
    // harmless: re-resolving an already-folded table is a no-op —
    // the log's keys no longer appear as canonicalIds.)
    val toFold: Seq[String] =
      if (dirty) { if (stages.exists(over) || logOver) stages else Nil }
      else stages.filter(over)
    if (toFold.isEmpty) return Nil

    def resolveIf(st: String, d: DataFrame): DataFrame =
      if (!dirty) d
      else {
        val b = bucketsOf(runDir, st)
        st match {
          case "nodes" => resolveNodesFrame(spark, runDir, d, b)
          case "assign" =>
            // a remapped row's canonical is no longer itself
            resolveCanon(spark, runDir, d, b).withColumn("ident",
              (col("canonicalId") === col("entityId")).cast("string"))
          case _ => resolveCanon(spark, runDir, d, b)
        }
      }
    val shapes: Map[String, DataFrame => DataFrame] = Map(
      "assign" -> (d => resolveIf("assign", d)
        .repartition(col("ident"), col("cb"))
        .sortWithinPartitions(col("cb"))),
      "nodes" -> (d => resolveIf("nodes", d).repartition(col("cb"))
        .sortWithinPartitions(col("cb"), col("kind"))),
      "edges" -> (d => resolveIf("edges", d).repartition(col("cb"))
        .sortWithinPartitions(col("cb"), col("pred"))))
    // the folds publish DISJOINT stages from already-published inputs
    // — run them concurrently, same shape and crash contract as the
    // tail-patch parallel publish in incrementalCanonicalize (each
    // fold re-checks its own manifest; a crashed subset re-folds on
    // retry, an already-folded stage is below threshold and skipped)
    def fold(st: String): Unit = {
      val m = Snapshots.readManifest(runDir, st)
      val (appendRows, sets) = Snapshots.appendStats(m)
      // carry the layout stamp: the next ingest's patch precondition
      // reads canonBuckets off the live manifest
      val keep = m.metrics.view
        .filterKeys(Set("canonBuckets", "epoch")).toMap
      Snapshots.compact(spark, runDir, st, runId,
        keep ++ Map("appendRowsFolded" -> appendRows.toString,
          "appendSetsFolded" -> sets.toString))(shapes(st))
      (): Unit
    }
    parallelRun(toFold.map(st => () => fold(st)))
    if (dirty) {
      import spark.implicits._
      val logical = Snapshots.readManifest(runDir, CanonLogStage)
        .metrics("logicalNodes")
      Snapshots.stage(spark, runDir, CanonLogStage, runId,
        resume = false,
        metrics = Map("dirty" -> "false", "logicalNodes" -> logical)) {
        Seq.empty[(Long, Long)].toDF("oldRoot", "newRoot")
      }
    }
    toFold
  }

  /** LINEAGE maintenance: the pinned-ingest path unions a stage's
    * last full version plus every delta appended since — after K
    * ingests that is a K-way union read (and a K-manifest sum) per
    * ingest, a plan/driver term that grows with INGEST COUNT.
    * Consolidating the union into a fresh FULL version resets the
    * lineage to length 1 (lineageVersions anchors at the last full),
    * and the folded-in versions expire.
    *
    * Crash-retry safety: a lineage delta is foldable ONLY when its
    * ingest COMMITTED — its runId has a tail record (an edges version
    * or a canon-log version). Folding an uncommitted slice — the
    * in-flight ingest's, or a FOREIGN ingest that crashed mid-append
    * and will retry — would break both oldUnion's excludeRunId and
    * appendOnce's idempotence key for that retry (its forms would
    * ride the consolidated full and re-derive as "already existing",
    * silently dropping its link edges). A stage holding any
    * uncommitted delta is skipped this round; it folds once the
    * crashed ingest retries (or stays unfolded, which is correct —
    * the state genuinely contains an incomplete ingest). Corollary:
    * expire edges/canon-log HISTORY only after lineage consolidation
    * has covered those runs, or their commit records become
    * unprovable and their deltas stay unfoldable. The consolidation
    * itself publishes under "<runId>-maint" (never an ingest runId,
    * so excludeRunId can never drop it), and a retry first expires
    * anything a crashed consolidation left superseded.
    */
  def compactLineage(spark: SparkSession, runDir: String, runId: String,
                     maxDeltas: Int): Seq[String] = {
    // extract is deliberately NOT here: its versions are disjoint
    // corpus slices under union-of-ALL-versions semantics (no delta
    // marker), so lineageVersions would anchor at the newest slice
    // and the cleanup pass would expire the rest of the corpus
    val stages = Seq("entities", "link_edges", "ep_shingles", "ep_keys")
    val committed: Set[String] =
      (Snapshots.versions(runDir, "edges").map(v =>
        Snapshots.readManifestVersion(runDir, "edges", v).runId) ++
        (if (Snapshots.isComplete(runDir, CanonLogStage))
          Snapshots.versions(runDir, CanonLogStage).map(v =>
            Snapshots.readManifestVersion(runDir, CanonLogStage, v).runId)
        else Nil)).toSet
    stages.filter(Snapshots.isComplete(runDir, _)).flatMap { st =>
      // cleanup pass (also the crash-retry of this function): expire
      // versions a previous consolidation superseded
      val lv = lineageVersions(runDir, st)
      Snapshots.versions(runDir, st).filterNot(lv.contains)
        .reverse.foreach(v => Snapshots.expire(runDir, st, v))
      val uncommitted = lv.tail.exists { v =>
        val r = Snapshots.readManifestVersion(runDir, st, v).runId
        r == runId || !committed.contains(r)
      }
      if (uncommitted || lv.length - 1 < maxDeltas) None
      else {
        // layout from the lineage's ANCHOR full version (deltas
        // publish unpartitioned; the consolidated full should keep
        // the base's partitioning)
        val partCols = Snapshots.partitionColsOf(
          Snapshots.readManifestVersion(runDir, st, lv.head))
        val df = lineageUnion(spark, runDir, st)
        Snapshots.stage(spark, runDir, st, s"$runId-maint",
          resume = false, partitionBy = partCols,
          metrics = Map("compacted" -> "true",
            "lineageFolded" -> lv.length.toString))(df)
        lv.reverse.foreach(v => Snapshots.expire(runDir, st, v))
        Some(st)
      }
    }
  }

  // ---- deferred-merge canon log (merge-on-read; Config.deferMerges)
  // A tiny compressed remap table: every canonical root a later merge
  // absorbed → its current root, SINGLE-HOP (each ingest rewrites the
  // whole log, which is bounded by merges-since-last-fold, so readers
  // never chain). `dirty` marks unresolved state; folds and the
  // global tail clear it.
  private[graft] val CanonLogStage = "canon_log"

  private[graft] def canonLogDirty(runDir: String): Boolean =
    Snapshots.isComplete(runDir, CanonLogStage) &&
      Snapshots.readManifest(runDir, CanonLogStage)
        .metrics.get("dirty").contains("true")

  /** Driver-resident log map (bounded by the fold trigger; callers
    * guard size before entering the deferred path).
    */
  private def canonLogMap(spark: SparkSession,
                          runDir: String): Map[Long, Long] = {
    import spark.implicits._
    if (!canonLogDirty(runDir)) Map.empty
    else Snapshots.read(spark, runDir, CanonLogStage)
      .select("oldRoot", "newRoot").as[(Long, Long)].collect().toMap
  }

  private def canonLogDf(spark: SparkSession, runDir: String) = {
    import spark.implicits._
    Snapshots.read(spark, runDir, CanonLogStage)
      .select($"oldRoot".as("canonicalId"), $"newRoot")
  }

  /** Resolve a frame's canonicalId through the dirty log (broadcast
    * join — the log is merges-since-fold small) and recompute cb.
    */
  private def resolveCanon(spark: SparkSession, runDir: String,
                           df: DataFrame, b: Long): DataFrame = {
    val cols = df.columns
    df.join(broadcast(canonLogDf(spark, runDir)), Seq("canonicalId"),
        "left")
      .withColumn("canonicalId",
        coalesce(col("newRoot"), col("canonicalId")))
      .withColumn("cb", pmod(col("canonicalId"), lit(b)).cast("int"))
      .select(cols.map(col): _*)
  }

  private def bucketsOf(runDir: String, stage: String): Long =
    Snapshots.readManifest(runDir, stage).metrics("canonBuckets").toLong

  /** CURRENT canonical nodes. With no dirty canon log this is the
    * stored snapshot verbatim; under deferred merges it resolves
    * stale canonicals through the log and re-aggregates rows sharing
    * a resolved root (constituent rows + per-ingest delta
    * contributions — the node schema was designed to combine
    * associatively: argmin (norm, form) pair, min kind, summed
    * memberCount). The merge-on-read read tax: one broadcast join +
    * one groupBy of the nodes table, until the next fold makes the
    * stored rows 1:1 again.
    */
  def readNodes(spark: SparkSession, runDir: String): DataFrame = {
    val raw = Snapshots.read(spark, runDir, "nodes")
    if (!canonLogDirty(runDir)) raw
    else resolveNodesFrame(spark, runDir, raw, bucketsOf(runDir, "nodes"))
  }

  /** The nodes-resolving combine (deferred merges are always bucketed,
    * so `b` is known): resolve roots through the log, then aggregate
    * rows sharing a resolved root.
    */
  private def resolveNodesFrame(spark: SparkSession, runDir: String,
                                raw: DataFrame, b: Long): DataFrame = {
    import spark.implicits._
    raw
      .join(broadcast(canonLogDf(spark, runDir)), Seq("canonicalId"),
        "left")
      .withColumn("rc", coalesce($"newRoot", $"canonicalId"))
      .groupBy($"rc")
      .agg(min(struct($"canonicalNorm".as("norm"),
        $"canonical".as("obj"))).as("m"),
        min($"kind").as("kind"), sum($"memberCount").as("memberCount"))
      .select($"rc".as("canonicalId"), $"m.obj".as("canonical"),
        $"m.norm".as("canonicalNorm"), $"kind", $"memberCount")
      .withColumn("cb", pmod($"canonicalId", lit(b)).cast("int"))
  }

  /** CURRENT canonical edges: stored snapshot, with stale
    * canonicalIds resolved through the dirty log (broadcast join,
    * no aggregation — edge rows are 1:1 triples).
    */
  def readEdges(spark: SparkSession, runDir: String): DataFrame = {
    val raw = Snapshots.read(spark, runDir, "edges")
    if (!canonLogDirty(runDir)) raw
    else resolveCanon(spark, runDir, raw, bucketsOf(runDir, "edges"))
  }

  /** Rows this runId appended to `stage` (0 when none): the sum over
    * this runId's snapshot versions' manifest rows. Lineage folds
    * publish under "<runId>-maint", so they can never be counted as an
    * ingest's own delta.
    */
  private def deltaRowsOf(runDir: String, stage: String,
                          runId: String): Long =
    Snapshots.versions(runDir, stage).flatMap { v =>
      val m = Snapshots.readManifestVersion(runDir, stage, v)
      if (m.runId == runId) Some(m.rows) else None
    }.sum

  /** Append a DELTA snapshot version, idempotent per runId: a
    * crash-retry that already published this ingest's slice reads it
    * back instead of appending a duplicate.
    */
  private def appendOnce(spark: SparkSession, runDir: String,
                         stage: String, runId: String,
                         extraMetrics: Map[String, String] = Map.empty)
                        (compute: => DataFrame): DataFrame = {
    Snapshots.versions(runDir, stage).find(v =>
      Snapshots.readManifestVersion(runDir, stage, v).runId == runId) match {
      case Some(v) => Snapshots.readVersion(spark, runDir, stage, v)
      case None => Snapshots.stage(spark, runDir, stage, runId,
        resume = false,
        metrics = Map("delta" -> "true") ++ extraMetrics)(compute)
    }
  }

  /** The drift measurement behind Config.maxCensusDrift (see the call
    * site in [[runIncrementalPinned]]). Returns 0.0 for an ingest with
    * no fuzzy delta shingles.
    */
  private def censusDrift(spark: SparkSession, runDir: String, cfg: Config,
                          hot: Seq[(String, Long)], deltaShingled: DataFrame,
                          deltaExtractRows: Long): Double = {
    import spark.implicits._
    // driftSample samples the delta's KEY SPACE (deterministic hash
    // bucket on (pred, sh)), never the stored rows: per-key dfs stay
    // EXACT, so the sampled drift is an unbiased mean over a uniform
    // key sample. Row-sampling was tried first and REJECTED on
    // measurement: scaling sampled counts by 1/p leaves near-cap keys
    // misclassified with high probability (Binomial variance around
    // the cap) and drops rare keys from the denominator entirely —
    // DriftBench read 0.12 at p=0.1 where the exact metric reads
    // 0.013 — and `.sample` reads every stored row anyway, so it
    // saved no IO. Key-sampling shrinks the probe side and the
    // aggregate by p with no bias, and is deterministic (replayed
    // ingests record the same drift).
    val deltaShAll = deltaShingled
      .select($"pred", explode($"shingles").as("sh")).distinct()
    val deltaSh =
      if (cfg.driftSample >= 1.0) deltaShAll
      else deltaShAll.filter(
        pmod(xxhash64($"pred", $"sh"), lit(1000000L)) <
          lit(math.round(cfg.driftSample * 1000000L)))
    val hinted =
      if (deltaExtractRows <= SkewJoin.BroadcastableRightRows)
        broadcast(deltaSh)
      else deltaSh
    val nEnts = lineageVersions(runDir, "entities").map(v =>
      Snapshots.readManifestVersion(runDir, "entities", v).rows).sum
    val freshCap = cfg.link.stopShingleCap(nEnts)
    val stored = lineageUnion(spark, runDir, "ep_shingles")
    val dfs = stored.select($"pred", explode($"shingles").as("sh"))
      .join(hinted, Seq("pred", "sh"))
      .groupBy($"pred", $"sh")
      .agg(count(lit(1)).cast("double").as("df"))
    val pinnedDf = hot.toDF("pred", "sh").withColumn("hp", lit(true))
    val row = dfs.join(broadcast(pinnedDf), Seq("pred", "sh"), "left")
      .select((($"df" > lit(freshCap.toDouble)) =!=
        coalesce($"hp", lit(false))).as("differs"))
      .agg(count(lit(1)).as("n"), sum($"differs".cast("long")).as("d"))
      .head()
    if (row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  /** Versions forming the current lineage of an appendable stage: the
    * last FULL (non-delta) version and every delta appended after it.
    * A stage that has only ever been globally recomputed has a
    * single-element lineage (its latest version).
    */
  private def lineageVersions(runDir: String, stage: String): Seq[Int] = {
    val vs = Snapshots.versions(runDir, stage)
    if (vs.isEmpty) return Nil
    // a lineage MUST be anchored by a full (non-delta) version: if the
    // base snapshot was expire()d while delta appends remain, falling
    // back to the oldest delta would silently drop the entire
    // pre-delta corpus from every union — fail fast instead
    val lastFull = vs.filter(v =>
      !Snapshots.readManifestVersion(runDir, stage, v)
        .metrics.get("delta").contains("true")).lastOption.getOrElse(
        throw new IllegalStateException(
          s"stage '$stage' in $runDir has only delta versions ($vs) — " +
            "its full base snapshot was expired; the lineage union " +
            "would silently drop the pre-delta corpus"))
    vs.filter(_ >= lastFull)
  }

  private def lineageUnion(spark: SparkSession, runDir: String,
                           stage: String,
                           excludeRunId: Option[String] = None): DataFrame =
    lineageVersions(runDir, stage)
      .filter(v => !excludeRunId.contains(
        Snapshots.readManifestVersion(runDir, stage, v).runId))
      .map(v => Snapshots.readVersion(spark, runDir, stage, v))
      .reduce(_ unionByName _)

  /** Stages 2–4 (entities → link edges → canonicalize → materialize):
    * everything downstream of the content scan, over narrow tables
    * only. Shared verbatim by [[run]] and [[runIncremental]].
    */
  private def downstream(spark: SparkSession, runDir: String,
                         runId: String, cfg: Config,
                         triples: DataFrame, resume: Boolean): Int = {
    import spark.implicits._

    // Stage 2a — entity surface forms
    val ents = Snapshots.stage(spark, runDir, "entities", runId, resume) {
      Linking.entities(triples.as[Triple])
    }

    // Stage 2b — link edges (exact-norm + LSH candidates + scoring).
    // The fuzzy-presence probe runs against the MATERIALIZED entities
    // snapshot (narrow, already on storage, limit-1 semantics) — not
    // against live extraction lineage, which would re-run the content
    // scan. It lives INSIDE the stage block so a resumed run (stage
    // manifest already present) never pays the probe job.
    // the shingle scratch table only lives for the duration of the
    // stage compute (the stage snapshot is durable before we return),
    // so the run-owned scratch dir is deleted afterwards — a
    // long-running ingest loop (kgIngestStream, repeated
    // runIncremental) would otherwise leak one corpus-sized parquet
    // table per ingest. Caller-supplied scratch dirs are caller-owned.
    val ownScratch = cfg.link.scratchDir.isEmpty
    val scratch = s"$runDir/_scratch/link_edges"
    val links = try {
      Snapshots.stage(spark, runDir, "link_edges", runId, resume) {
        val fuzzyNonEmpty =
          !ents.filter(col("pred").isin(Linking.FuzzyPreds: _*)).isEmpty
        // shared shingle table materialized once under the run dir
        // (read 4x by the link plans; see Linking.sharedShingles)
        // unless the caller already chose a scratch location
        val linkCfg =
          if (cfg.link.scratchDir.isDefined) cfg.link
          else cfg.link.copy(scratchDir = Some(scratch))
        Linking.linkEdges(ents, linkCfg, Some(fuzzyNonEmpty),
          sizeHint = Some(Snapshots.readManifest(runDir, "entities").rows))
      }
    } finally if (ownScratch) Snapshots.deleteDir(scratch)

    canonicalize(spark, runDir, runId, cfg, triples, ents, links, resume)
  }

  /** Stages 3–4 (canonicalize → materialize) — shared by the global
    * paths ([[run]]/[[runIncremental]] via [[downstream]]) and the
    * epoch-pinned path ([[runIncrementalPinned]], which supplies
    * union-of-versions entity/edge tables instead of freshly relinked
    * ones).
    */
  private def canonicalize(spark: SparkSession, runDir: String,
                           runId: String, cfg: Config,
                           triples: DataFrame, ents: DataFrame,
                           links: DataFrame, resume: Boolean): Int = {
    import spark.implicits._
    // Stage 3 — connected components → canonical id per entity.
    // Singleton entities (no link edge) canonicalize to themselves.
    var ccIters = 0
    // opt-in canonical-bucket layout (see Config.canonBuckets). Dirs
    // are cb-only (plus ident on assign, which the edges stage prunes
    // and counts from the manifest): nesting pred/kind under B buckets
    // would multiply the dir count by their cardinality for no
    // maintenance benefit. Instead pred/kind CLUSTER inside each
    // bucket file via sortWithinPartitions — the Iceberg
    // bucket-transform + sort-order shape — so low-cardinality
    // predicates still skip via row-group stats. A repartition on the
    // dir columns keeps the file count ≈ #dirs instead of tasks×dirs.
    val cbMetrics = cfg.canonBuckets
      .map(b => Map("canonBuckets" -> b.toString)).getOrElse(Map.empty)
    def withCb(df: DataFrame): DataFrame = cfg.canonBuckets
      .map(b => df.withColumn("cb",
        pmod($"canonicalId", lit(b.toLong)).cast("int"))).getOrElse(df)
    def arranged(df: DataFrame, parts: Seq[String],
                 cluster: Seq[String]): DataFrame =
      if (cfg.canonBuckets.isDefined)
        df.repartition(parts.map(col): _*)
          .sortWithinPartitions((parts ++ cluster).map(col): _*)
      else df
    def partCols(base: Seq[String], keepBase: Boolean): Seq[String] =
      if (cfg.canonBuckets.isEmpty) base
      else if (keepBase) base :+ "cb"
      else Seq("cb")
    // partitioned by `ident` (canonical == self) so the edges stage can
    // read the small non-identity DELTA slice partition-pruned, and
    // count it from the manifest's partition-dir lineage with no job
    val assignParts = partCols(Seq("ident"), keepBase = true)
    val assign = Snapshots.stage(spark, runDir, "assign", runId, resume,
      partitionBy = assignParts,
      metrics = Map("ccIterations" -> ccIters.toString) ++ cbMetrics) {
      // exact edge count for free from the link_edges lineage
      // manifests: CC's path decision then costs no count job and no
      // raw-edge cache (see ConnectedComponents.run's edgeCountHint)
      val (a, iters) = assignCanonical(ents, links, cfg.hotThreshold,
        cfg.ccLocalThreshold,
        edgeCountHint = Some(lineageVersions(runDir, "link_edges").map(v =>
          Snapshots.readManifestVersion(runDir, "link_edges", v).rows).sum))
      ccIters = iters
      arranged(withCb(a.withColumn("ident", $"canonicalId" === $"entityId")),
        assignParts, Nil)
    }
    // cross-version resume guard: the edges stage needs the assign
    // snapshot's ident column/partitioning (the delta-map rewrite). A
    // runDir whose assign snapshot predates that schema would otherwise
    // fail with an opaque unresolved-column error — or worse, silently
    // sum deltaRows to 0 from manifests lacking ident=false/ paths.
    require(assign.columns.contains("ident"),
      s"assign snapshot in $runDir predates the ident-partitioned " +
        "schema; cross-version resume is unsupported — re-run with " +
        "resume=false or a fresh runDir")

    // Stage 4a — nodes (shared nodeTable logic; the snapshot keeps the
    // canonicalNorm argmin column so comp merges recombine, see
    // nodeTableFull).
    val nodesParts = partCols(Seq("kind"), keepBase = false)
    def nodesStage(): Unit = {
      Snapshots.stage(spark, runDir, "nodes", runId, resume,
        partitionBy = nodesParts, metrics = cbMetrics) {
        arranged(withCb(nodeTableFull(assign)), nodesParts, Seq("kind"))
      }
      (): Unit
    }

    // Stage 4b — edges: triples rewritten onto canonical ids via the
    // canonical DELTA map. Only entities whose canonical id DIFFERS
    // from their own id need rewriting — a small fraction at any scale
    // (12.5% of 2.0M at the 200k-file bench; most entities are
    // unlinked singletons), and most of those never shrink the
    // fraction below what broadcast can hold until the corpus is huge.
    // Left-join the pruned ident=false slice and coalesce: when the
    // delta fits the broadcast cap this stage shuffles NOTHING of the
    // triple side (skew-immune by construction); beyond the cap it
    // degrades to a left shuffle join against the delta — still
    // strictly smaller than the full 1:1 map the previous design
    // joined (AQE covers hub-entity skew there).
    val edgesParts = partCols(Seq("pred"), keepBase = false)
    def edgesStage(): Unit = {
      Snapshots.stage(spark, runDir, "edges", runId, resume,
      partitionBy = edgesParts, metrics = cbMetrics) {
      val withId = triples.withColumn("entityId", Linking.idCol($"pred", $"obj"))
      val deltaRows = Snapshots.readManifest(runDir, "assign").fileRows
        .collect { case (f, n) if f.contains("ident=false/") => n }.sum
      val delta = assign.filter(!$"ident".cast("boolean"))
        .select($"entityId", $"canonicalId")
      val joined =
        if (deltaRows <= SkewJoin.BroadcastableRightRows)
          withId.join(broadcast(delta), Seq("entityId"), "left")
        else withId.join(delta, Seq("entityId"), "left")
      arranged(withCb(joined.select($"subj", $"pred",
        coalesce($"canonicalId", $"entityId").as("canonicalId"), $"conf",
        $"repo", $"path", $"commit")), edgesParts, Seq("pred"))
      }
      (): Unit
    }

    // nodes and edges both derive from the PUBLISHED assign snapshot
    // and publish disjoint stages — run the two narrow materializations
    // concurrently (same shape and crash contract as the tail-patch
    // parallel publish in incrementalCanonicalize: resume re-checks
    // each stage's own manifest, so any crashed subset heals)
    parallelRun(Seq(() => nodesStage(), () => edgesStage()))

    // the global tail recomputed everything from source, so any
    // deferred-merge canon log is now fully applied — clear it, or
    // readers would re-resolve (harmlessly but wrongly-taxed) and the
    // next deferred ingest would compose stale remaps
    if (canonLogDirty(runDir)) {
      Snapshots.stage(spark, runDir, CanonLogStage, runId,
        resume = false, metrics = Map("dirty" -> "false")) {
        Seq.empty[(Long, Long)].toDF("oldRoot", "newRoot")
      }
    }
    ccIters
  }

  /** All counts come from stage manifests (no recount jobs); the
    * quarantine split falls out of the q= partition-dir keys in the
    * extract manifests' per-file lineage. Extract counts SUM across
    * snapshot versions (a full run has one; each incremental ingest
    * appends one); entities/link_edges sum their current LINEAGE
    * (one full version after a global relink; full + disjoint delta
    * appends under a pinned epoch); assign/nodes/edges are always
    * globally recomputed, so their latest manifest IS the global
    * count.
    */
  private def resultFrom(runDir: String, runId: String,
                         ccIters: Int): Result = {
    val extractManifests = Snapshots.versions(runDir, "extract")
      .map(v => Snapshots.readManifestVersion(runDir, "extract", v))
    val rawRows = extractManifests.map(_.rows).sum
    val quarantined = extractManifests.flatMap(_.fileRows.collect {
      case (f, n) if f.startsWith("q=true/") => n
    }).sum
    def lineageRows(stage: String): Long = lineageVersions(runDir, stage)
      .map(v => Snapshots.readManifestVersion(runDir, stage, v).rows).sum
    Result(
      runId = runId,
      triples = rawRows - quarantined,
      quarantined = quarantined,
      entities = lineageRows("entities"),
      linkEdges = lineageRows("link_edges"),
      // under deferred merges the stored node ROWS over-count merged
      // components; the canon log's manifest carries the exact
      // logical count by driver arithmetic
      nodes = if (canonLogDirty(runDir))
        Snapshots.readManifest(runDir, CanonLogStage)
          .metrics("logicalNodes").toLong
      else Snapshots.readManifest(runDir, "nodes").rows,
      edges = Snapshots.readManifest(runDir, "edges").rows,
      ccIterations = ccIters
    )
  }
}
