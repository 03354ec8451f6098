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
      arrangePartitions: Option[Int] = None
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
                        ConnectedComponents.LocalEdgeThreshold): (DataFrame, Int) = {
    val cc = ConnectedComponents.run(links, hotThreshold,
      localThreshold = ccLocalThreshold)
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
    assign.groupBy("canonicalId")
      .agg(
        min(struct(col("norm"), col("obj"))).as("m"),
        min(col("pred")).as("kind"),
        count(lit(1)).as("memberCount"))
      .select(col("canonicalId"), col("m.obj").as("canonical"), col("kind"),
        col("memberCount"))

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

    // delta-only extract, as a new snapshot version — UNLESS a version
    // with this runId already exists: a retry after a crash during the
    // downstream stages must not append the same delta twice (the
    // union below would double-count its triples). Idempotence key =
    // the caller's runId, same contract as Streaming.ingestBatch.
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
    }

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

    // Stage 3 — connected components → canonical id per entity.
    // Singleton entities (no link edge) canonicalize to themselves.
    var ccIters = 0
    // partitioned by `ident` (canonical == self) so the edges stage can
    // read the small non-identity DELTA slice partition-pruned, and
    // count it from the manifest's partition-dir lineage with no job
    val assign = Snapshots.stage(spark, runDir, "assign", runId, resume,
      partitionBy = Seq("ident"),
      metrics = Map("ccIterations" -> ccIters.toString)) {
      val (a, iters) = assignCanonical(ents, links, cfg.hotThreshold,
        cfg.ccLocalThreshold)
      ccIters = iters
      a.withColumn("ident", $"canonicalId" === $"entityId")
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

    // Stage 4a — nodes (shared nodeTable logic).
    val nodes = Snapshots.stage(spark, runDir, "nodes", runId, resume,
      partitionBy = Seq("kind")) {
      nodeTable(assign)
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
    val edges = Snapshots.stage(spark, runDir, "edges", runId, resume,
      partitionBy = Seq("pred")) {
      val withId = triples.withColumn("entityId", Linking.idCol($"pred", $"obj"))
      val deltaRows = Snapshots.readManifest(runDir, "assign").fileRows
        .collect { case (f, n) if f.startsWith("ident=false/") => n }.sum
      val delta = assign.filter(!$"ident".cast("boolean"))
        .select($"entityId", $"canonicalId")
      val joined =
        if (deltaRows <= SkewJoin.BroadcastableRightRows)
          withId.join(broadcast(delta), Seq("entityId"), "left")
        else withId.join(delta, Seq("entityId"), "left")
      joined.select($"subj", $"pred",
        coalesce($"canonicalId", $"entityId").as("canonicalId"), $"conf",
        $"repo", $"path", $"commit")
    }

    ccIters
  }

  /** All counts come from stage manifests (no recount jobs); the
    * quarantine split falls out of the q= partition-dir keys in the
    * extract manifests' per-file lineage. Extract counts SUM across
    * snapshot versions (a full run has one; each incremental ingest
    * appends one); downstream stages are always globally recomputed,
    * so their latest manifest IS the global count.
    */
  private def resultFrom(runDir: String, runId: String,
                         ccIters: Int): Result = {
    val extractManifests = Snapshots.versions(runDir, "extract")
      .map(v => Snapshots.readManifestVersion(runDir, "extract", v))
    val rawRows = extractManifests.map(_.rows).sum
    val quarantined = extractManifests.flatMap(_.fileRows.collect {
      case (f, n) if f.startsWith("q=true/") => n
    }).sum
    Result(
      runId = runId,
      triples = rawRows - quarantined,
      quarantined = quarantined,
      entities = Snapshots.readManifest(runDir, "entities").rows,
      linkEdges = Snapshots.readManifest(runDir, "link_edges").rows,
      nodes = Snapshots.readManifest(runDir, "nodes").rows,
      edges = Snapshots.readManifest(runDir, "edges").rows,
      ccIterations = ccIters
    )
  }
}
