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

  def run(spark: SparkSession, files: Dataset[SourceFile], runDir: String,
          runId: String, cfg: Config = Config()): Result = {
    import spark.implicits._
    val resume = cfg.resume

    // Stage 1 — extraction. repartitionByRange(repo, path) gives
    // deterministic per-partition lineage and co-locates each repo's
    // files (north star verbatim).
    // subj ("repo/path") is derivable — materializing it would fatten
    // the biggest stage's parquet by ~15% and its write wall by ~20%
    // (WriteProbe); it is dropped on write and re-derived on read
    val raw0 = Snapshots.stage(spark, runDir, "extract", runId, resume,
      partitionBy = Seq("pred")) {
      val arranged = files.repartitionByRange(
        cfg.arrangePartitions.getOrElse(
          files.sparkSession.sparkContext.defaultParallelism),
        $"repo", $"path")
      Extraction.extract(arranged, cfg.extraction).toDF().drop("subj")
    }
    val raw = raw0.withColumn("subj", concat($"repo", lit("/"), $"path"))

    // pred partition pruning: these scans never touch quarantine rows
    val triples = raw.filter($"pred" =!= Extraction.QuarantinePred)

    // Stage 2a — entity surface forms
    val ents = Snapshots.stage(spark, runDir, "entities", runId, resume) {
      Linking.entities(triples.as[Triple])
    }

    // Stage 2b — link edges (exact-norm + LSH candidates + scoring).
    // Fuzzy-pred presence comes free from the extract manifest's pred=
    // partition lineage — no emptiness probe job.
    val fuzzyNonEmpty = Snapshots.readManifest(runDir, "extract").fileRows
      .exists { case (f, n) =>
        n > 0 && Linking.FuzzyPreds.exists(p => f.startsWith(s"pred=$p/"))
      }
    val links = Snapshots.stage(spark, runDir, "link_edges", runId, resume) {
      Linking.linkEdges(ents, cfg.link, Some(fuzzyNonEmpty),
        sizeHint = Some(Snapshots.readManifest(runDir, "entities").rows))
    }

    // Stage 3 — connected components → canonical id per entity.
    // Singleton entities (no link edge) canonicalize to themselves.
    var ccIters = 0
    val assign = Snapshots.stage(spark, runDir, "assign", runId, resume,
      metrics = Map("ccIterations" -> ccIters.toString)) {
      val cc = ConnectedComponents.run(links, cfg.hotThreshold)
      ccIters = cc.iterations
      ents.join(cc.assignments.withColumnRenamed("id", "entityId"),
          Seq("entityId"), "left")
        .select($"pred", $"obj", $"norm", $"entityId",
          coalesce($"comp", $"entityId").as("canonicalId"))
    }

    // Stage 4a — nodes: deterministic canonical surface form = the
    // (norm, obj)-minimal member; kind is constant within a component
    // (linking never crosses preds).
    val nodes = Snapshots.stage(spark, runDir, "nodes", runId, resume,
      partitionBy = Seq("kind")) {
      assign.groupBy("canonicalId")
        .agg(
          min(struct($"norm", $"obj")).as("m"),
          min($"pred").as("kind"),
          count(lit(1)).as("memberCount"))
        .select($"canonicalId", $"m.obj".as("canonical"), $"kind",
          $"memberCount")
    }

    // Stage 4b — edges: triples rewritten onto canonical ids. The
    // assign side is unique per entityId; the triple side is skewed on
    // hub entities → SkewJoin.
    val edges = Snapshots.stage(spark, runDir, "edges", runId, resume,
      partitionBy = Seq("pred")) {
      val withId = triples.withColumn("entityId", Linking.idCol($"pred", $"obj"))
      SkewJoin.joinUniqueRight(
          withId, assign.select($"entityId", $"canonicalId"),
          "entityId", cfg.hotThreshold,
          leftCountHint = Some(Snapshots.readManifest(runDir, "extract").rows),
          rightCountHint = Some(Snapshots.readManifest(runDir, "assign").rows))
        .select($"subj", $"pred", $"canonicalId", $"conf",
          $"repo", $"path", $"commit")
    }

    // all counts come from stage manifests (no recount jobs); the
    // quarantine split falls out of the pred= partition-dir keys in
    // the extract manifest's per-file lineage
    val extractManifest = Snapshots.readManifest(runDir, "extract")
    val rawRows = extractManifest.rows
    val quarantined = extractManifest.fileRows.collect {
      case (f, n) if f.startsWith(s"pred=${Extraction.QuarantinePred}/") => n
    }.sum
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
