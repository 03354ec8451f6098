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

  /** Deterministic stratified sampling: keep a row iff its md5 bucket
    * falls under its stratum's rate threshold — the training-mixture
    * reweighting pass (e.g. downsample crawl to 30%, keep books at
    * 100%). Same decide-by-hash machinery as [[splitAssign]] but
    * salted differently (`sample:` prefix), so sampling decisions are
    * independent of split assignment — without the salt, every
    * sampled-out document would come from the same end of the split
    * buckets. Pure codegen'd filter: no shuffle, reproducible across
    * re-runs/partitioning, auditable in any md5-capable engine.
    *
    * `rates`: stratum value → keep fraction in [0,1]; strata absent
    * from the map use `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, idCol: Column, strataCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame =
    df.filter(stratifiedKeep(idCol, strataCol, rates, defaultRate))

  /** The keep predicate of [[stratifiedSample]] as a pure Column —
    * lets a caller that only needs the DECISION (e.g. a one-pass
    * funnel count) evaluate it alongside other flags instead of
    * re-evaluating its input subtree through a filter.
    */
  private[graft] def stratifiedKeep(idCol: Column, strataCol: Column,
                                    rates: Map[String, Double],
                                    defaultRate: Double = 1.0): Column = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r"))
    val bucket = substring(md5(concat(lit("sample:"), idCol.cast("string"))), 1, 4)
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(hexThreshold(defaultRate))) { case ((stratum, rate), acc) =>
      when(strataCol === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    // rate 1.0 keeps everything: hexThreshold caps at 'ffff' which a
    // 4-hex bucket can reach, so compare with <= only for the cap
    bucket < threshold ||
      (threshold === lit("ffff") && bucket === lit("ffff"))
  }

  /** Token-budget mixture planning: derive each stratum's keep rate
    * from its ACTUAL token mass so it contributes ≈ its target token
    * budget, then apply the deterministic hash filter
    * ([[stratifiedSample]]). This is the operational form of a
    * training-mixture spec — "200B tokens of crawl, everything from
    * books" — where the rates nobody knows up front are derived from
    * one aggregation:
    *
    *   rate(s) = min(1, budget(s) / Σ tokens(s))
    *
    * Strata without a budget keep everything (rate 1.0). Because the
    * per-doc keep decision is the salted md5 bucket — independent of
    * document length — the kept token mass is an unbiased estimate of
    * the budget (±sampling noise ∝ 1/√docs); no doc-boundary packing
    * tricks are needed.
    *
    * Scale shape: ONE map-side-combined aggregation over (stratum,
    * tokens) whose result is collected (bounded by #strata — mixture
    * strata are a handful by construction), then the shuffle-free
    * codegen'd filter. The rates are a deterministic function of the
    * data, so re-runs reproduce the same corpus bit-identically, and
    * the DuckDB twin recomputes the whole derivation (sums → IEEE
    * rate division → hex thresholds) inside the oracle.
    */
  def mixToBudget(df: DataFrame, idCol: Column, strataCol: Column,
                  tokensCol: Column,
                  budgets: Map[String, Long]): DataFrame = {
    budgets.values.foreach(b => require(b >= 0L, s"negative budget $b"))
    val sums = df.groupBy(strataCol.as("__s"))
      .agg(coalesce(sum(tokensCol.cast("long")), lit(0L)).as("__tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = budgets.flatMap { case (s, b) =>
      sums.get(s).collect { case tot if tot > 0L =>
        s -> math.min(1.0, b.toDouble / tot.toDouble)
      }
    }
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 1.0)
  }

  /** Concatenate-and-chunk sequence packing (the GPT-style pretraining
    * layout): within each `group` (corpus/source), documents are laid
    * end-to-end in `order` and the token stream is cut every `budget`
    * tokens. Returns per document its exclusive token offset and the
    * first/last context-window bin it lands in (documents may straddle
    * a cut — that is the concat-packing contract; no padding waste).
    *
    * TWO-PHASE DISTRIBUTED PREFIX SUM (the zipWithIndex shape). A
    * `Window.partitionBy(group).orderBy(order)` running sum would put
    * every row of a group through ONE task — with a handful of
    * (split, stratum) groups that is a handful of reducers for the
    * whole corpus, wall ≈ corpus/#groups single-threaded no matter the
    * cluster size. Instead:
    *
    *   1. repartitionByRange(group, order) + sortWithinPartitions —
    *      ONE shuffle; each partition holds a contiguous slice of the
    *      global (group, order) order, parallelism = partition count;
    *   2. per-(partition, group) token totals, collected to the driver
    *      — tiny by construction: groups are contiguous within a
    *      range partition, so ≤ #partitions + #groups − 1 entries;
    *   3. exclusive cumulative offsets per (partition, group) computed
    *      on the driver, broadcast back;
    *   4. a second pass over the SAME shuffled partitions adds
    *      offset + local running sum.
    *
    * Both passes run over one RDD instance, so the range bounds are
    * sampled once and the shuffle map stage is computed once (pass 2
    * reuses the registered map outputs — the standard same-RDD
    * multi-job contract zipWithIndex relies on). Offsets therefore
    * cannot disagree between passes even though range-boundary
    * sampling is itself nondeterministic across executions; and the
    * OUTPUT is boundary-independent anyway, because (group, order) is
    * a strict total order under the uniqueness precondition below.
    *
    * Zero-token rows occupy no stream positions: start_tok is the
    * usual exclusive prefix and last_bin is clamped to first_bin (the
    * row "sits at" its boundary). A null token count reads as 0; a
    * negative one fails the job.
    *
    * DETERMINISM PRECONDITION: `orderCol` must be unique within each
    * group (a document id, not a timestamp with duplicates) — rows
    * tied on the order column are summed in partition-internal
    * arrival order, which would make offsets/bins vary across
    * re-runs and partitionings, forfeiting this module's
    * stable-across-re-runs contract.
    */
  def packSequences(df: DataFrame, groupCol: Column, orderCol: Column,
                    tokensCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType

    // the per-(partition, group) totals are keyed by the group VALUE on
    // the driver (JVM equality), while the range order uses SQL
    // ordering — the two must agree or group runs interleave with
    // distinct driver keys and the offsets silently skew. Floating
    // groups break that agreement (-0.0 and 0.0 are SQL-equal but
    // Java-distinct keys; NaN orderings differ) and map types are not
    // orderable at all, so both are rejected up front — group keys are
    // corpus/source/stratum labels, which have no business being
    // floats.
    locally {
      import org.apache.spark.sql.types._
      def floaty(dt: DataType): Boolean = dt match {
        case FloatType | DoubleType => true
        case s: StructType          => s.fields.exists(f => floaty(f.dataType))
        case a: ArrayType           => floaty(a.elementType)
        case _: MapType             => true
        case _                      => false
      }
      val dt = df.select(groupCol.as("g")).schema.head.dataType
      require(!floaty(dt),
        "packSequences: group column must not contain float/double/map " +
          s"(driver-key equality vs SQL ordering mismatch); got " +
          s"${dt.simpleString}")
    }

    val grpC = "__pack_grp"; val ordC = "__pack_ord"; val tokC = "__pack_tok"
    val ranged = df
      .withColumn(grpC, groupCol)
      .withColumn(ordC, orderCol)
      .withColumn(tokC, tokensCol.cast("long"))
      .repartitionByRange(col(grpC), col(ordC))
      .sortWithinPartitions(col(grpC), col(ordC))
    // .rdd pins ONE physical execution (bounds sampled once, shuffle
    // written once); both jobs below run over this instance
    val rdd = ranged.rdd
    val schema = ranged.schema
    val gi = schema.fieldIndex(grpC)
    val ti = schema.fieldIndex(tokC)
    def tokOf(r: Row): Long =
      if (r.isNullAt(ti)) 0L
      else {
        val t = r.getLong(ti)
        require(t >= 0L, s"packSequences: negative token count $t")
        t
      }

    // pass 1 — per-(partition, group) token totals, in group-run order
    // (groups are contiguous within a sorted range partition)
    val partTotals: Array[Array[(Any, Long)]] =
      rdd.mapPartitionsWithIndex { (_, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Any, Long)]
        var cur: Any = null; var open = false; var sum = 0L
        it.foreach { r =>
          val g = r.get(gi)
          if (!open || g != cur) {
            if (open) out += ((cur, sum))
            cur = g; open = true; sum = 0L
          }
          sum += tokOf(r)
        }
        if (open) out += ((cur, sum))
        Iterator.single(out.toArray)
      }.collect()

    // driver — exclusive cumulative offset of each group at each
    // partition's start (scan partitions in range order)
    val running = scala.collection.mutable.HashMap.empty[Any, Long]
    val offsets: Array[Map[Any, Long]] = partTotals.map { totals =>
      val off = totals.map { case (g, _) =>
        g -> running.getOrElse(g, 0L)
      }.toMap
      totals.foreach { case (g, s) =>
        running(g) = running.getOrElse(g, 0L) + s
      }
      off
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // pass 2 — same partitions (map outputs reused): offset + local
    // running sum = the global exclusive prefix
    val withStart = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bc.value(pid)
      var cur: Any = null; var open = false; var run = 0L
      it.map { r =>
        val g = r.get(gi)
        if (!open || g != cur) {
          cur = g; open = true; run = off.getOrElse(g, 0L)
        }
        val start = run
        run += tokOf(r)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
    spark.createDataFrame(withStart, schema.add("start_tok", LongType,
        nullable = false))
      .withColumn("first_bin", floor(col("start_tok") / budget))
      .withColumn("last_bin", greatest(col("first_bin"),
        floor((col("start_tok") + col(tokC) - 1) / budget)))
      .drop(grpC, ordC, tokC)
  }
}
