package graft.canon

import graft.link.SkewJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage 3 — canonicalization: connected components over the link
  * graph via alternating large-star / small-star DataFrame self-joins
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — O(log n) rounds, each round a groupBy-min plus a join,
  * both shuffle-bounded.
  *
  * Skew: hub entities give some nodes enormous degree; every
  * neighbor-min join goes through SkewJoin.joinUniqueRight (hot keys
  * broadcast, cold keys shuffle) and the groupBy-mins are map-side
  * combined. Lineage is cut by persisting each round and
  * checkpointing every `checkpointEvery` rounds — an iterative plan
  * would otherwise grow exponentially in the optimizer.
  */
object ConnectedComponents {

  final case class Result(assignments: DataFrame, iterations: Int)

  /** edges: (src: Long, dst: Long). Returns (id, comp) for every node
    * that appears in `edges`, comp = min node id of its component.
    */
  def run(edges0: DataFrame, hotThreshold: Long = 100000L,
          maxIter: Int = 50, checkpointEvery: Int = 3): Result = {
    val spark = edges0.sparkSession

    var e = edges0.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prevSig = signature(e)
    var iter = 0
    var converged = false
    val retained = scala.collection.mutable.Buffer[DataFrame](e)

    while (!converged && iter < maxIter) {
      iter += 1
      val ls = largeStar(e, hotThreshold)
      var next = smallStar(ls, hotThreshold)
      if (iter % checkpointEvery == 0) next = next.checkpoint()
      else next = next.persist(StorageLevel.MEMORY_AND_DISK)
      val sig = signature(next)
      converged = sig == prevSig
      prevSig = sig
      retained += next
      e = next
      // free all but the current iteration's cache
      if (retained.size > 2) retained.remove(0).unpersist(false)
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // at the fixpoint every edge is (child -> component root)
    val assignments = e.select(col("src").as("id"), col("dst").as("comp"))
      .unionByName(e.select(col("dst").as("id"), col("dst").as("comp")))
      .distinct()
    Result(assignments, iter)
  }

  /** Cheap order-insensitive fixpoint signature of an edge set. */
  private def signature(e: DataFrame): (Long, Long) = {
    // bit_xor: order-insensitive and overflow-free under ANSI mode
    // (edge sets are distinct, so xor cancellation cannot collide)
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h")
    ).head()
    (row.getLong(0), row.getLong(1))
  }

  /** large-star: every node connects its strictly-larger neighbors to
    * the minimum of its neighborhood (including itself).
    */
  private[canon] def largeStar(e: DataFrame, hotThreshold: Long): DataFrame = {
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src")
      .agg(min("dst").as("m"))
      .select(col("src"), least(col("m"), col("src")).as("m"))
    SkewJoin.joinUniqueRight(sym.filter(col("dst") > col("src")), mins,
        "src", hotThreshold)
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: orient edges big→small; every node connects its
    * smaller-or-equal neighbors (and itself) to the neighborhood min.
    */
  private[canon] def smallStar(e: DataFrame, hotThreshold: Long): DataFrame = {
    val oriented = e.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst")
    ).filter(col("src") =!= col("dst")).distinct()
    val mins = oriented.groupBy("src").agg(min("dst").as("m"))
    val relinked = SkewJoin.joinUniqueRight(oriented, mins, "src", hotThreshold)
    relinked.select(col("dst").as("v"), col("m"))
      .unionByName(mins.select(col("src").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }
}
