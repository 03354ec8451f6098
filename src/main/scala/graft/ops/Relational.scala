package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators from the reference's inventory (SURVEY.md §2)
  * over star-schema tables: the Excel profile aggregate (S5), joins,
  * windows, anti-joins, pivots, sessionization.
  */
object Relational {

  /** S5 corpus-profile: per-group count/sum/min/max/avg
    * (/root/reference/python.py:552-562 numeric describe).
    */
  def profileAgg(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"),
        round(max(col("l_extendedprice")), 4).as("max_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"))

  /** Revenue per nation: big-side lineitem joins BROADCAST dims
    * (supplier, nation) — the dimension tables are tiny at any scale.
    */
  def revenueByNation(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Top-k rows per group with deterministic tie-break (the bounded
    * list cap of the extraction templates, as a window).
    */
  def topOrdersPerPriority(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
  }

  /** Customers with no order above `minPrice` — anti join
    * (NOT EXISTS) with a pushed-down predicate on the probe side.
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             minPrice: Double = 0.0): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minPrice),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Daily event pivot: conditional aggregation per event type
    * (the create_graph_from_input tabular family,
    * /root/reference/Demo_Prompts/create_graph_from_input/system.md).
    */
  def eventsDailyPivot(events: DataFrame,
                       types: Seq[String]): DataFrame = {
    val perType = types.map(t =>
      sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t"))
    val aggs = perType :+ round(sum(col("value")), 4).as("sum_value")
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Sessionization: per-user session ids from inactivity gaps —
    * lag + cumulative sum windows (no custom state needed in batch).
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // exact-microsecond gap arithmetic: unix_timestamp floors to
    // seconds and would disagree with µs-precise oracles/streaming
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(prevTs.isNull, 1)
      .when(unix_micros(col("ts").cast("timestamp")) -
        unix_micros(prevTs.cast("timestamp")) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("session_seq",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select("event_id", "user_id", "session_seq")
  }

  /** As-of join: each left row picks the LATEST right row with the
    * same key and rightTime <= leftTime (left-outer semantics — no
    * match leaves the payload null). Right's non-key columns surface
    * as `asof_<col>`.
    *
    * Spark-first plan: instead of a per-key inequality join (which
    * Catalyst can only execute as a broadcast-nested-loop or a
    * range-join blowup), both sides are UNIONED and sorted per key by
    * (time, side) — right rows before left rows at equal timestamps,
    * making the match inclusive — and a running `last(payload)` window
    * carries the most recent right payload onto each left row. ONE
    * shuffle on the key, no join explosion, linear in rows at any
    * scale; the payload travels as a single struct so the matched
    * columns always come from the SAME right row (per-column last()
    * would tear rows when a right payload column is legitimately
    * null). Skewed keys behave like any other wide window (AQE-sized
    * partitions); ties between right rows on (key, time) resolve
    * DETERMINISTICALLY to the struct-max payload (lexicographic over
    * the right's non-key columns in their declared order — max_by
    * semantics), so the output never depends on partitioning or scan
    * order. NB: a SQL ASOF JOIN twin resolves such ties by ITS own
    * arbitrary choice — when hash-comparing against one, assert the
    * right side has no (key, time) duplicates (fixture-guarded for the
    * asof_join gate in OpsSpec).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               prefix: String = "asof_"): DataFrame = {
    val reserved = Seq("__t", "__p", "__is_left")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"asofJoin: input columns ${clash.mkString(", ")} collide with " +
        "reserved temp names __t/__p/__is_left — rename them first")
    // the deterministic tie-break orders the window by the __p payload
    // struct, so every right payload column must be of an ORDERABLE
    // type (no MapType): a map-typed payload column fails analysis
    // here rather than running with arbitrary tie resolution
    val unorderable = right.schema.fields
      .filterNot(f => keys.contains(f.name))
      .filterNot(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
    require(unorderable.isEmpty,
      s"asofJoin: right payload columns ${unorderable.map(_.name).mkString(", ")} " +
        "have unorderable types (e.g. map) — the deterministic tie-break " +
        "sorts by the payload struct; drop or re-encode them first")
    val payload = right.columns.filterNot(keys.contains).toSeq
    val r = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+
        struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    // ordering ends on __p: among right rows tied on (key, __t) the
    // running last() picks the struct-max payload; left rows are
    // unaffected (__is_left=1 sorts after all tied right rows, and a
    // left row's own __p is null which last(ignoreNulls) skips anyway)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__p.$c").as(s"$prefix$c")): _*)
  }

  /** Workbook-metadata flatten — the Excel per-sheet metadata analog
    * (/root/reference/python.py:511-548: sheet names, column headers,
    * merged-cell counts per sheet): one row per sheet from a nested
    * `sheets: array<struct>` column. Pure explode — map-side only, no
    * shuffle, scales linearly with sheet count.
    */
  def flattenSheets(workbooks: DataFrame): DataFrame =
    workbooks.select(col("doc_id"), explode(col("sheets")).as("sh"))
      .select(col("doc_id"), col("sh.sheet").as("sheet"),
        col("sh.n_cols").as("n_cols"), col("sh.n_merged").as("n_merged"))
}
