package graft.link

import graft.Triple
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 2 — blocking-key entity linking.
  *
  * Mentions (distinct (pred, obj) surface forms from the triple set)
  * are linked into same-entity edge lists by two complementary paths:
  *
  *  1. exact-norm blocking: forms identical after normalization
  *     (lowercase, whitespace collapse, trailing dots stripped) link
  *     directly — a groupBy on the blocking key (pred, norm).
  *  2. MinHash-LSH candidates: 3-gram character shingles of the
  *     normalized form → hand-rolled min-xxhash64 band keys (r=1,
  *     OR-numHashTables) joined on (pred, band, key), then each
  *     candidate pair SCORED with the exact set Jaccard over the true
  *     shingle sets inside a shuffle join (the sort-merge-join scoring
  *     phase of the north rule). Pairs with Jaccard ≥ threshold and
  *     equal pred become edges.
  *
  * Absent from the reference (it has no linking at all — SURVEY.md §2
  * "relational-operator absences"); this is the new KG capability the
  * north rule adds. The fat `content` column never reaches this stage:
  * the input is the (subj, pred, obj) projection only, so Catalyst
  * prunes everything else at the triple-snapshot scan.
  */
object Linking {

  /** Predicates whose objects are fuzzy-linkable entity mentions; all
    * other predicates still get exact-norm linking (uniform path) but
    * skip the LSH join.
    */
  val FuzzyPreds: Seq[String] =
    Seq("mentions_domain", "references", "tagged", "imports")

  final case class Config(
      threshold: Double = 0.5, // min Jaccard similarity on 3-gram shingles
      numHashTables: Int = 5,
      shingleSize: Int = 3,
      seed: Long = 42L,
      hotThreshold: Long = 100000L,
      // fuzzy sets at or below this size take the exact shingle-block
      // join (all pairs sharing a shingle, exact-Jaccard scored) —
      // a strict superset of the banded candidate set with the SAME
      // scoring rule, so crossing the threshold only affects recall of
      // borderline candidates, never scores. Above it, banding bounds
      // the candidate blowup (the 100 TB path).
      exactSmallThreshold: Long = 100000L
  )

  /** Normalized blocking form. */
  def normCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(lower(trim(c)), "\\s+", " "), "\\.+$", "")

  /** Stable 64-bit entity id of a surface form. Collision probability
    * is checked (count distinct vs count) by the pipeline's metrics.
    */
  def idCol(pred: org.apache.spark.sql.Column,
            obj: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(pred, lit("\u0000"), obj)

  /** Distinct entity surface forms: (pred, obj, norm, entityId). */
  def entities(triples: Dataset[Triple]): DataFrame =
    entitiesOf(triples.toDF())

  /** Same over any frame with (pred, obj) columns — the entry point
    * for callers that assemble mention tables outside the typed
    * pipeline (e.g. the oracle-checked kg_nodes_exact query).
    */
  def entitiesOf(predObj: DataFrame): DataFrame =
    predObj.select(col("pred"), col("obj")).distinct()
      .withColumn("norm", normCol(col("obj")))
      .withColumn("entityId", idCol(col("pred"), col("obj")))

  /** Same-entity edges (src, dst) over entityIds.
    *
    * `fuzzyNonEmpty`: whether any FuzzyPreds entity exists. Callers
    * that already know (e.g. Pipeline, from the extract manifest's
    * pred= partition lineage) pass Some(_) and skip the probe job the
    * emptiness guard otherwise costs (MinHashLSH.fit reads a first row
    * to size the input and throws on an empty dataset).
    */
  def linkEdges(ents: DataFrame, cfg: Config = Config(),
                fuzzyNonEmpty: Option[Boolean] = None,
                sizeHint: Option[Long] = None): DataFrame = {
    val exact = exactNormEdges(ents, cfg)
    val fuzzyEnts = ents.filter(col("pred").isin(FuzzyPreds: _*))
    val spark = ents.sparkSession
    import spark.implicits._
    val fuzzy =
      if (!fuzzyNonEmpty.getOrElse(!fuzzyEnts.isEmpty))
        Seq.empty[(Long, Long)].toDF("src", "dst")
      else if (sizeHint.exists(_ <= cfg.exactSmallThreshold))
        exactJaccardEdges(fuzzyEnts, cfg)
      else lshEdges(fuzzyEnts, cfg)
    exact.unionByName(fuzzy).distinct()
  }

  /** Path 1: link every form to the min-id form of its (pred, norm)
    * block. Block sizes are bounded (surface variants of one entity),
    * so the join is not skew-prone; AQE covers residual imbalance.
    */
  private[link] def exactNormEdges(ents: DataFrame, cfg: Config): DataFrame = {
    val mins = ents.groupBy("pred", "norm")
      .agg(min("entityId").as("dst"), count(lit(1)).as("n"))
      .filter(col("n") > 1).drop("n")
    ents.join(mins, Seq("pred", "norm"))
      .filter(col("entityId") =!= col("dst"))
      .select(col("entityId").as("src"), col("dst"))
  }

  /** Debug view of LSH pairs with distances (test use only). */
  def lshEdges2Debug(ents: DataFrame, cfg: Config): Dataset[(Long, Long, Double)] = {
    val spark = ents.sparkSession
    import spark.implicits._
    lshEdgesWithDist(ents, cfg).as[(Long, Long, Double)]
  }

  private[link] def lshEdgesWithDist(ents: DataFrame, cfg: Config): DataFrame =
    lshEdgesImpl(ents, cfg, keepDist = true)

  /** Path 2: MinHash-LSH candidate generation + exact-Jaccard scoring. */
  private[link] def lshEdges(ents: DataFrame, cfg: Config): DataFrame =
    lshEdgesImpl(ents, cfg, keepDist = false)

  /** Distinct character k-shingles of the padded norm, computed with
    * codegen'd higher-order functions (no UDF).
    * NB: rpad TRUNCATES strings longer than the target length — pad
    * only the genuinely short ones.
    */
  private def withShingles(ents: DataFrame, k: Int): DataFrame =
    ents.withColumn("padded",
        when(length(col("norm")) < k, rpad(col("norm"), k, "_"))
          .otherwise(col("norm")))
      .withColumn("shingles", array_distinct(
        expr(s"transform(sequence(0, length(padded) - $k), i -> substring(padded, i + 1, $k))")))
      .drop("padded")

  /** Small-set fuzzy path: exact shingle-block join. Candidates = all
    * pairs of same-pred forms sharing at least one k-shingle (a strict
    * superset of what banding can surface), scored with exact set
    * Jaccard on the distinct-shingle counts — the same rule the LSH
    * path applies to its candidates.
    */
  private[link] def exactJaccardEdges(ents: DataFrame, cfg: Config): DataFrame = {
    val shingled = withShingles(ents, cfg.shingleSize)
    val ex = shingled.select(col("pred"), col("entityId"),
      size(col("shingles")).as("sz"), explode(col("shingles")).as("sh"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.pred") === col("b.pred") && col("a.sh") === col("b.sh") &&
          col("a.entityId") < col("b.entityId"))
      .groupBy(col("a.entityId").as("src"), col("b.entityId").as("dst"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .filter(col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")) >= cfg.threshold)
      .select(col("src"), col("dst"))
  }

  /** Scale fuzzy path: hand-rolled MinHash banding for candidates
    * (key_i = min over the form's distinct shingles of
    * xxhash64(seed+i, shingle); r=1, OR-numHashTables — the same table
    * shape MLlib's MinHashLSH builds, without the fit step or TF
    * feature hashing), then exact set-Jaccard re-scoring over the TRUE
    * shingle sets with the boundary-INCLUSIVE `>= threshold` rule —
    * i.e. exactly the scoring contract of [[exactJaccardEdges]], so
    * crossing `exactSmallThreshold` changes only candidate recall,
    * never the score of a surfaced pair (no TF hash collisions, no
    * strict-vs-inclusive boundary drift).
    */
  private def lshEdgesImpl(ents: DataFrame, cfg: Config,
                           keepDist: Boolean): DataFrame = {
    val shingled = withShingles(ents, cfg.shingleSize)
    val aggs = (0 until cfg.numHashTables).map(i =>
      min(xxhash64(lit(cfg.seed + i), col("sh"))).as(s"k$i"))
    val keys = shingled
      .select(col("pred"), col("entityId"), explode(col("shingles")).as("sh"))
      .groupBy(col("pred"), col("entityId")).agg(aggs.head, aggs.tail: _*)
    val banded = keys.select(col("pred"), col("entityId"),
        explode(array((0 until cfg.numHashTables).map(i =>
          struct(lit(i).as("band"), col(s"k$i").as("key"))): _*)).as("bk"))
      .select(col("pred"), col("entityId"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.as("a").join(banded.as("b"), Seq("pred", "band", "key"))
      .filter(col("a.entityId") < col("b.entityId"))
      .select(col("pred"), col("a.entityId").as("src"),
        col("b.entityId").as("dst"))
      .distinct()
    val sets = shingled.select(col("pred"), col("entityId"), col("shingles"))
    val inter = size(array_intersect(col("sa.shingles"), col("sb.shingles")))
      .cast("double")
    val uni = (size(col("sa.shingles")) + size(col("sb.shingles")))
      .cast("double") - inter
    val scored = cand
      .join(sets.as("sa"), cand("src") === col("sa.entityId") &&
        cand("pred") === col("sa.pred"))
      .join(sets.as("sb"), cand("dst") === col("sb.entityId") &&
        cand("pred") === col("sb.pred"))
      .select(col("src"), col("dst"), (inter / uni).as("j"))
      .filter(col("j") >= cfg.threshold)
    if (keepDist)
      scored.select(col("src"), col("dst"), (lit(1.0) - col("j")).as("dist"))
    else scored.select(col("src"), col("dst"))
  }
}
