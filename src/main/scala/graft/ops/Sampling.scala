package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * A training-data engine needs a train/val/test assignment that is
  *  - deterministic per document (re-runs, resumes, and incremental
  *    ingests must never move a document across splits — the classic
  *    leakage bug with `rand()`-based splits),
  *  - independent of partitioning and row order,
  *  - computable by any engine that has md5 (so the assignment can be
  *    audited outside Spark — the DuckDB correctness twin recomputes
  *    it exactly).
  *
  * Mechanism: bucket = the first 4 hex chars of md5(id) — a uniform
  * 16-bit value — compared LEXICOGRAPHICALLY against per-split
  * threshold strings (4-digit lowercase hex of floor(cumFraction ×
  * 65536)). Lexicographic order on fixed-width lowercase hex equals
  * numeric order, so the whole assignment is a codegen'd CASE chain
  * over one md5 call: a pure narrow map — no shuffle, no state, scale
  * is the scan itself. Granularity is 1/65536 ≈ 0.0015% of the corpus
  * per bucket step, plenty for split fractions.
  *
  * The reference has no splitting (its corpus is one upload batch,
  * SURVEY.md §2 "relational-operator absences"); this is part of the
  * added large-scale-pipeline surface alongside dedup/similarity.
  */
object Sampling {

  /** 4-digit lowercase hex threshold of a cumulative fraction. */
  private[graft] def hexThreshold(cum: Double): String =
    f"${math.min(65535L, (cum * 65536.0).toLong)}%04x"

  /** `splits`: (name, fraction) in assignment order; fractions must
    * sum to ~1 (the last split absorbs rounding). Returns the input
    * with a `split` column.
    */
  def splitAssign(df: DataFrame, idCol: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = substring(md5(idCol.cast("string")), 1, 4)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    // CASE bucket < t1 THEN s1 WHEN bucket < t2 THEN s2 ... ELSE last
    val assigned = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cum), acc) =>
      when(bucket < lit(hexThreshold(cum)), name).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }
}
