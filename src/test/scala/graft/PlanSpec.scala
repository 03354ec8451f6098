package graft

import graft.extract.Extraction
import graft.fixtures.FilesGen
import graft.link.Linking
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations we design for must be
  * visible in `explain`, not just assumed — predicate pushdown, column
  * pruning (the fat `content` column never reaches linking), broadcast
  * joins on dimensions, whole-stage codegen on the text operators.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sfDir("0.01")
  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    // other suites cache the same testdata paths; a cached relation
    // would hide the scan we're asserting on
    spark.catalog.clearCache()
    df.queryExecution.executedPlan.toString
  }

  test("filters reach the parquet scan (PushedFilters)") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"lang" === "en").select("doc_id")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), p)
  }

  test("projection prunes columns at the scan (ReadSchema)") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
    assert(!p.contains("text"), "text must not be read")
  }

  test("linking stage never reads content from the triple snapshot") {
    // write a triple snapshot, then check the entity scan's schema
    val snap = java.nio.file.Files.createTempDirectory("graft-plan").toString
    Extraction.triples(Extraction.extract(FilesGen.dataset(spark, 50)))
      .toDF().write.mode("overwrite").parquet(snap)
    val ents = Linking.entities(spark.read.parquet(snap).as[Triple])
    val p = plan(ents)
    assert(p.contains("ReadSchema: struct<pred:string,obj:string>"),
      s"entity scan must prune provenance + everything else:\n$p")
  }

  test("dimension joins broadcast (revenue_by_nation)") {
    val df = SparkEntry.queries("revenue_by_nation")(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "tiny dims must not sort-merge:\n" + p)
  }

  test("text operators stay inside whole-stage codegen") {
    val df = SparkEntry.queries("quality_score")(spark, dir)
    val p = plan(df)
    assert(p.contains("*(1)"), s"expected a codegen stage:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("mapPartitions"), p)
  }

  test("extract snapshot prunes quarantine partitions on read") {
    val runDir = java.nio.file.Files.createTempDirectory("graft-plan2").toString
    Extraction.extract(FilesGen.dataset(spark, 50))
      .toDF().write.mode("overwrite").partitionBy("pred").parquet(runDir)
    val df = spark.read.parquet(runDir)
      .filter($"pred" === "imports").select("subj", "obj")
    val p = df.queryExecution.toString()
    // partition filter present → non-matching pred dirs are never listed
    assert(plan(df).contains("PartitionFilters"), plan(df))
  }

  test("simhash hashes the vocabulary once and broadcasts it back") {
    // the round-4 fix for the dedup_simhash regression: the md5 chain
    // must sit on the DISTINCT-vocabulary side of a broadcast join,
    // never in the per-occurrence scan path. Execute first — AQE picks
    // the broadcast at runtime from the vocab's actual size.
    val df = graft.ops.Dedup.simhash(
      spark.read.parquet(s"$dir/documents.parquet"))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"vocab join must broadcast (AQE, small vocab):\n$p")
  }

  test("lshTopK probe plans as a shuffle-free pruned scan") {
    // band-key probe = literal comparisons in a map filter feeding
    // TakeOrderedAndProject: no join, no Exchange anywhere — the plan
    // shape that turns into a bucket-pruned scan on a stored table
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val p = plan(graft.ops.Similarity.lshTopK(embs, q, 10))
    assert(!p.toLowerCase.contains("join"), p)
    assert(!p.contains("Exchange"), s"probe must not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("lshCandidates materializes the banded subtree once (ReusedExchange)") {
    // the star and clique branches of the window census both consume
    // the banded-keys exchange; AQE must materialize that shuffle ONCE
    // and reuse the stage in the second branch. Losing this property
    // (e.g. by putting a partial aggregate between `banded` and its
    // exchange, as the rejected groupBy+join census did) re-runs the
    // minhash-signature subtree — the stage's most expensive compute —
    // and measured +67% on link_edges at 200k files (BENCH.md §0).
    import graft.link.Linking
    val forms = (0 until 3000).map(i => s"entity-form-number-$i-of-the-corpus")
    val ents = Linking.entitiesOf(
      forms.toDF("obj").withColumn("pred", lit("tagged")))
    val sh = Linking.withShingles(ents, 3)
    val cand = Linking.lshCandidates(sh, Linking.Config(), 3000L)
    cand.collect() // drive AQE to the final plan on THIS QueryExecution
    val p = cand.queryExecution.executedPlan.toString
    assert(p.linesIterator.next().contains("isFinalPlan=true"), p.take(500))
    assert(p.contains("ReusedExchange"),
      s"banded exchange must be materialized once and reused:\n${p.take(4000)}")
  }

  test("asofJoin plans one shuffle and no join operator") {
    // the whole point of the union+window design: a per-key inequality
    // join would appear as BroadcastNestedLoopJoin (or a range-join
    // blowup); the operator must instead show exactly one Exchange (on
    // the key) feeding a Window, with zero join nodes
    val left = spark.range(1000)
      .select(($"id" % 7).as("k"), $"id".as("t"), $"id".as("lid"))
    val right = spark.range(500)
      .select(($"id" % 7).as("k"), ($"id" * 2).as("t"), $"id".as("rid"))
    val p = plan(graft.ops.Relational.asofJoin(left, right, Seq("k"), "t", "t"))
    assert(!p.toLowerCase.contains("join"), p)
    assert(p.contains("Window"), p)
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"expected at most the one keyed exchange (+AQE read):\n$p")
  }
}
