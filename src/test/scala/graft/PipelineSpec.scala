package graft

import graft.fixtures.FilesGen
import graft.store.Snapshots
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-pipe-$tag").toString

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private val n = 400
  private lazy val files = FilesGen.dataset(spark, n)

  test("snapshot time travel: every publish stays queryable until expired") {
    val dir = tmpDir("tt")
    def publish(xs: Seq[Long]): Unit =
      Snapshots.stage(spark, dir, "demo", "tt", resume = false) {
        xs.toDF("x")
      }
    publish(Seq(1L, 2L, 3L))
    publish(Seq(10L, 20L))
    assert(Snapshots.versions(dir, "demo") == Seq(1, 2))
    // current read = latest snapshot; v1 still queryable (time travel)
    assert(Snapshots.read(spark, dir, "demo")
      .as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    assert(Snapshots.readVersion(spark, dir, "demo", 1)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(Snapshots.readManifest(dir, "demo").version.contains(2))
    assert(Snapshots.readManifestVersion(dir, "demo", 1).rows == 3)
    // the current snapshot refuses to expire; old ones go away fully
    intercept[IllegalArgumentException](Snapshots.expire(dir, "demo", 2))
    Snapshots.expire(dir, "demo", 1)
    assert(Snapshots.versions(dir, "demo") == Seq(2))
    intercept[Exception](Snapshots.readVersion(spark, dir, "demo", 1))
    deleteRec(Path.of(dir))
  }

  test("a publish crashed between versioned manifest and live pointer is invisible and replaced") {
    val dir = tmpDir("crashwin")
    def publish(xs: Seq[Long]): Unit =
      Snapshots.stage(spark, dir, "demo", "cw", resume = false) {
        xs.toDF("x")
      }

    // crash window on the FIRST publish: versioned manifest written,
    // live pointer never moved (the retried run must recompute as v1,
    // not v2 — otherwise versions() lists a snapshot isComplete()
    // denies and incremental consumers double-count the base corpus)
    publish(Seq(1L, 2L, 3L))
    Files.delete(Path.of(Snapshots.stageDir(dir, "demo"), "_MANIFEST.json"))
    assert(!Snapshots.isComplete(dir, "demo"))
    assert(Snapshots.versions(dir, "demo") == Nil)
    intercept[Exception](Snapshots.readManifestVersion(dir, "demo", 1))
    // retry (resume=true takes the compute path — no live manifest)
    Snapshots.stage(spark, dir, "demo", "cw-retry") { Seq(7L, 8L).toDF("x") }
    assert(Snapshots.versions(dir, "demo") == Seq(1))
    assert(Snapshots.read(spark, dir, "demo")
      .as[Long].collect().sorted.toSeq == Seq(7L, 8L))

    // crash window on a LATER publish: v2 manifest lands, live stays
    // at v1 — v2 is an orphan, invisible everywhere, and the next
    // compute replaces it under the same version number
    val liveBak = Files.readString(
      Path.of(Snapshots.stageDir(dir, "demo"), "_MANIFEST.json"))
    publish(Seq(100L))
    Files.writeString(
      Path.of(Snapshots.stageDir(dir, "demo"), "_MANIFEST.json"), liveBak)
    assert(Snapshots.versions(dir, "demo") == Seq(1))
    intercept[Exception](Snapshots.readVersion(spark, dir, "demo", 2))
    publish(Seq(200L, 201L))
    assert(Snapshots.versions(dir, "demo") == Seq(1, 2))
    assert(Snapshots.read(spark, dir, "demo")
      .as[Long].collect().sorted.toSeq == Seq(200L, 201L))
    assert(Snapshots.readVersion(spark, dir, "demo", 1)
      .as[Long].collect().sorted.toSeq == Seq(7L, 8L))
    deleteRec(Path.of(dir))
  }

  test("stagePatch: copy-on-write partial overwrite — carried files, appends, chaining, expire guard") {
    val dir = tmpDir("patch")
    def readSet = Snapshots.read(spark, dir, "t")
      .select("x", "b").as[(Long, Int)].collect().toSet
    Snapshots.stage(spark, dir, "t", "p1", resume = false,
      partitionBy = Seq("b")) {
      Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2)).toDF("x", "b")
    }
    // v2 rewrites b=0 (drops x=2, adds x=10) and APPENDS x=99 with
    // b=2 to the unpartitioned append set — b=1 and b=2 dirs of the
    // base are carried by reference
    Snapshots.stagePatch(spark, dir, "t", "p2", Seq("b=0"), Seq("b")) {
      Seq((1L, 0), (10L, 0)).toDF("x", "b")
    } {
      Seq((99L, 2)).toDF("x", "b")
    }
    assert(readSet == Set((1L, 0), (10L, 0), (3L, 1), (4L, 2), (99L, 2)))
    val m2 = Snapshots.readManifest(dir, "t")
    assert(m2.rows == 5 && m2.version.contains(2))
    assert(m2.baseFiles.get.keys.forall(_.startsWith("snap=1/")))
    assert(!m2.baseFiles.get.keys.exists(_.contains("/b=0/")))
    // time travel: v1 still reads as the original full snapshot
    assert(Snapshots.readVersion(spark, dir, "t", 1).count() == 4)
    // chained patch: v3 rewrites b=2. The FULL new content of b=2 is
    // (7,2) — the v2 append row (99,2) sat in the now-rewritten bucket
    // and must NOT survive via append consolidation; the new append
    // (50,1) replaces the prior append set alongside carried b=1
    Snapshots.stagePatch(spark, dir, "t", "p3", Seq("b=2"), Seq("b")) {
      Seq((7L, 2)).toDF("x", "b")
    } {
      Seq((50L, 1)).toDF("x", "b")
    }
    assert(readSet == Set((1L, 0), (10L, 0), (3L, 1), (50L, 1), (7L, 2)))
    assert(Snapshots.readManifest(dir, "t").rows == 5)
    // appends CONSOLIDATE: v3's manifest carries no snap=2 append file
    assert(!Snapshots.readManifest(dir, "t").baseFiles.get.keys
      .exists(p => p.startsWith("snap=2/append")))
    // a patch on a patch where the prior append row SURVIVES (b=1 not
    // rewritten): v4 rewrites b=0; (50,1) must ride into v4's append
    Snapshots.stagePatch(spark, dir, "t", "p4", Seq("b=0"), Seq("b")) {
      Seq((11L, 0)).toDF("x", "b")
    } {
      spark.emptyDataset[(Long, Int)].toDF("x", "b")
    }
    assert(readSet == Set((11L, 0), (3L, 1), (50L, 1), (7L, 2)))
    // expire guard: earlier snapshots stay pinned while patches carry
    // their files
    intercept[IllegalArgumentException](Snapshots.expire(dir, "t", 1))
    intercept[IllegalArgumentException](Snapshots.expire(dir, "t", 3))
    deleteRec(Path.of(dir))
  }

  // resolving readers: identical to raw Snapshots.read while no dirty
  // canon log exists (every pre-deferral test), log-resolved under
  // deferred merges
  private def edgeSet(runDir: String): Set[(String, String, Long)] =
    Pipeline.readEdges(spark, runDir)
      .select("subj", "pred", "canonicalId")
      .as[(String, String, Long)].collect().toSet

  private def nodeSet(runDir: String): Set[(Long, String, String, Long)] =
    Pipeline.readNodes(spark, runDir)
      .select("canonicalId", "canonical", "kind", "memberCount")
      .as[(Long, String, String, Long)].collect().toSet

  test("end-to-end pipeline: counts coherent, manifests complete") {
    val dir = tmpDir("fresh")
    val res = Pipeline.run(spark, files, dir, "run-1")
    assert(res.triples > 0 && res.entities > 0 && res.linkEdges > 0)
    assert(res.nodes > 0 && res.edges == res.triples,
      "every triple must materialize as exactly one canonical edge")
    assert(res.nodes <= res.entities, "canonicalization must not add nodes")
    Pipeline.Stages.foreach { s =>
      assert(Snapshots.isComplete(dir, s), s"stage $s incomplete")
      val m = Snapshots.readManifest(dir, s)
      assert(m.rows >= 0 && m.fileRows.values.sum == m.rows)
    }
    // lineage: manifest row counts match the data
    assert(Snapshots.readManifest(dir, "edges").rows == res.edges)
  }

  test("resume after kill between stages reproduces the fresh run") {
    val fresh = tmpDir("a")
    val r1 = Pipeline.run(spark, files, fresh, "run-a")

    // simulate a crash AFTER link_edges published but BEFORE assign's
    // manifest: data present, manifest missing (the kill window of
    // FIXTURES.md §5), downstream stages absent entirely
    val crashed = tmpDir("b")
    Pipeline.run(spark, files, crashed, "run-b")
    Files.delete(Path.of(Snapshots.stageDir(crashed, "assign"), "_MANIFEST.json"))
    deleteRec(Path.of(Snapshots.stageDir(crashed, "nodes")))
    deleteRec(Path.of(Snapshots.stageDir(crashed, "edges")))

    val r2 = Pipeline.run(spark, files, crashed, "run-b-resumed")
    assert(r2.triples == r1.triples && r2.entities == r1.entities)
    assert(edgeSet(crashed) == edgeSet(fresh))
    assert(nodeSet(crashed) == nodeSet(fresh))
  }

  test("incremental ingest equals the from-scratch run over the full corpus") {
    // full(A ∪ B) in one dir; run(A) + runIncremental(B) in another
    val all = FilesGen.local(n)
    val (a, b) = all.splitAt(n * 3 / 4)
    val full = tmpDir("inc-full")
    val rFull = Pipeline.run(spark, all.toDS(), full, "run-full")

    val inc = tmpDir("inc")
    Pipeline.run(spark, a.toDS(), inc, "run-base")
    val rInc = Pipeline.runIncremental(spark, b.toDS(), inc, "run-delta")

    // identical graph: nodes, edges, and every count
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(rInc.copy(runId = "x") == rFull.copy(runId = "x"))

    // the content scan was honestly incremental: extract has two
    // versions, the second holding ONLY the delta's triples
    assert(Snapshots.versions(inc, "extract") == Seq(1, 2))
    val v1 = Snapshots.readManifestVersion(inc, "extract", 1).rows
    val v2 = Snapshots.readManifestVersion(inc, "extract", 2).rows
    assert(v1 + v2 == rFull.triples + rFull.quarantined)
    assert(v2 < v1, s"delta version should be the smaller ingest: $v1/$v2")
    // prior graph state stays time-travelable: the v1 nodes snapshot
    // is the base run's graph, not the merged one
    val nodesV1 = Snapshots.readVersion(spark, inc, "nodes", 1).count()
    val nodesV2 = Snapshots.readVersion(spark, inc, "nodes", 2).count()
    assert(nodesV2 == rFull.nodes && nodesV1 < nodesV2)

    // a first-ingest call on an empty dir is refused
    val ex = intercept[IllegalArgumentException] {
      Pipeline.runIncremental(spark, b.toDS(), tmpDir("inc-empty"), "x")
    }
    assert(ex.getMessage.contains("first ingest"), ex.getMessage)

    // crash-retry idempotence: simulate a crash AFTER the delta
    // extract published but BEFORE edges completed, then retry the
    // SAME ingest — the delta extract must NOT be appended twice
    // (union would double-count its triples), and the repaired graph
    // still equals the from-scratch run
    Files.delete(Path.of(Snapshots.stageDir(inc, "edges"), "_MANIFEST.json"))
    val rRetry = Pipeline.runIncremental(spark, b.toDS(), inc, "run-delta")
    assert(Snapshots.versions(inc, "extract") == Seq(1, 2),
      "retry must not append a duplicate delta extract version")
    assert(rRetry.copy(runId = "x") == rFull.copy(runId = "x"))
    assert(edgeSet(inc) == edgeSet(full))

    // run() refuses a dir with incremental extract versions — its
    // resume path reads only the latest (delta-only) snapshot
    val ex2 = intercept[IllegalArgumentException] {
      Pipeline.run(spark, all.toDS(), inc, "run-wrong")
    }
    assert(ex2.getMessage.contains("runIncremental"), ex2.getMessage)
  }

  // Equality scope: holds for runs where no band bucket exceeds
  // maxBandBucket — oversized buckets are star-restructured by the
  // from-scratch comparator but scored delta-vs-all by the delta path
  // (a superset of true merges; Linking.deltaFuzzyEdges). This corpus
  // stays far below the 10k default cap, so the contract applies.
  test("epoch-pinned ingest equals from-scratch under the pinned census; delta appends only") {
    val all = FilesGen.local(n)
    val (a, b) = all.splitAt(n * 3 / 4)
    // force the banded fuzzy path everywhere: the epoch's stored-key
    // mechanism IS the banded scheme, so the base run and the
    // comparator must take it too (the exact small-set path surfaces a
    // candidate superset — equality holds only path-for-path)
    def cfg(hot: Option[Seq[(String, Long)]]) = Pipeline.Config(
      link = graft.link.Linking.Config(exactSmallThreshold = 0L,
        pinnedHot = hot))

    val inc = tmpDir("ep-inc")
    Pipeline.run(spark, a.toDS(), inc, "ep-base", cfg(None))
    Pipeline.pinEpoch(spark, inc, "ep-pin", cfg(None))
    val hot = Snapshots.read(spark, inc, "ep_census")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rPinned = Pipeline.runIncrementalPinned(spark, b.toDS(), inc,
      "ep-delta", cfg(None))

    // from-scratch comparator: full pipeline on A ∪ B under the SAME
    // frozen census (pinned right after the base run = the base run's
    // own census by the cap convention)
    val full = tmpDir("ep-full")
    val rFull = Pipeline.run(spark, all.toDS(), full, "ep-fullrun",
      cfg(Some(hot)))
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(rPinned.nodes == rFull.nodes && rPinned.edges == rFull.edges)
    assert(rPinned.triples == rFull.triples &&
      rPinned.entities == rFull.entities)

    // the ingest appended DELTA slices (no global relink): entities,
    // shingles, keys, and link_edges all carry a second (delta)
    // version; the extract stayed delta-only
    Seq("extract", "entities", "ep_shingles", "ep_keys", "link_edges")
      .foreach { st =>
        assert(Snapshots.versions(inc, st) == Seq(1, 2), st)
      }
    assert(Snapshots.readManifestVersion(inc, "link_edges", 2)
      .metrics.get("delta").contains("true"))

    // crash-retry idempotence mid-chain: kill after the delta link
    // published but before edges completed; the retry must not append
    // duplicate delta slices anywhere
    Files.delete(Path.of(Snapshots.stageDir(inc, "edges"), "_MANIFEST.json"))
    val rRetry = Pipeline.runIncrementalPinned(spark, b.toDS(), inc,
      "ep-delta", cfg(None))
    Seq("entities", "ep_shingles", "ep_keys", "link_edges").foreach { st =>
      assert(Snapshots.versions(inc, st) == Seq(1, 2), s"$st dup delta")
    }
    assert(rRetry.copy(runId = "x") == rPinned.copy(runId = "x"))
    assert(nodeSet(inc) == nodeSet(full))

    // a global relink BUMPS the epoch: pinned state is dropped and a
    // further pinned ingest is refused until re-pinned
    Pipeline.runIncremental(spark, b.take(10).toDS(), inc, "ep-bump",
      cfg(None))
    val ex = intercept[IllegalArgumentException] {
      Pipeline.runIncrementalPinned(spark, b.toDS(), inc, "ep-x", cfg(None))
    }
    assert(ex.getMessage.contains("pinEpoch"), ex.getMessage)
  }

  test("incremental canonicalize: O(delta) bucket patches equal the global tail across chained ingests") {
    // purpose-built corpus with GUARANTEED cross-ingest merges: each
    // norm class "wordN" gets its plain form in the base, an UPPER
    // variant in delta 1 (even classes) and a trailing-dot variant in
    // delta 2 (odd classes) — every variant file must link into an
    // already-stored component. Deltas also RE-MENTION stored forms
    // (b: the base's plain form; c: delta-1's upper variant, whose
    // component merged an ingest earlier), exercising the edges
    // patch's old-form canonical resolution through prior patches.
    // New classes appear in each delta too (pure appends).
    def f(name: String, forms: Seq[String]) = SourceFile("r", name, "c0",
      "md", forms.map(w => s"q: $w?").mkString("\n"))
    // 80 classes over 64 buckets: ~20 merged-away roots per delta
    // touch a strict subset of buckets, so the patch manifests MUST
    // carry untouched base files (asserted below)
    val classes = (0 until 80).map(i => s"word$i")
    val a = classes.zipWithIndex.map { case (w, i) => f(s"a$i.txt", Seq(w)) }
    val b = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 0 =>
        f(s"b$i.txt", Seq(w.toUpperCase) ++
          (if (i % 6 == 0) Seq(classes(i / 2)) else Nil)) // re-mention base
    } ++ Seq(f("bnew1.txt", Seq("brandnew1")), f("bnew2.txt", Seq("brandnew2")))
    val c = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 1 =>
        // i % 5 == 0 files also re-mention delta-1's stored upper
        // variant of class 38 (a component that MERGED an ingest ago)
        f(s"c$i.txt", Seq(w + ".") ++
          (if (i % 5 == 0) Seq(classes(38).toUpperCase) else Nil))
    } ++ Seq(f("cnew.txt", Seq("brandnew3")))
    val all = a ++ b ++ c
    def cfg = Pipeline.Config(canonBuckets = Some(64),
      arrangePartitions = Some(4))

    val inc = tmpDir("icc")
    Pipeline.run(spark, a.toDS(), inc, "icc-base", cfg)
    Pipeline.pinEpoch(spark, inc, "icc-pin", cfg)
    val r1 = Pipeline.runIncrementalPinned(spark, b.toDS(), inc, "icc-d1", cfg)
    val r2 = Pipeline.runIncrementalPinned(spark, c.toDS(), inc, "icc-d2", cfg)
    assert(r1.linkEdges > 20 && r2.linkEdges > r1.linkEdges)

    // the tail really PATCHED both times (no silent global fallback):
    // live manifests carry files by reference and the patch marker
    Seq("assign", "nodes", "edges").foreach { st =>
      val m = Snapshots.readManifest(inc, st)
      assert(m.metrics.get("patched").contains("true"), s"$st not patched")
      assert(m.runId == "icc-d2" && m.baseFiles.exists(_.nonEmpty), st)
      assert(m.metrics("canonBuckets") == "64", st)
    }
    // real merged-away roots in BOTH ingests (half the variant ids
    // hash below their class root) — otherwise this test proves
    // nothing about bucket rewrites
    Seq(2, 3).foreach { v =>
      assert(Snapshots.readManifestVersion(inc, "assign", v)
        .metrics("merges").toLong > 0, s"assign v$v had no merges")
    }

    // graph equality vs a from-scratch run over A ∪ B ∪ C (asks is
    // not a fuzzy pred: no census in play, so the unpinned comparator
    // is exact)
    val full = tmpDir("icc-full")
    val rFull = Pipeline.run(spark, all.toDS(), full, "icc-fullrun", cfg)
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(r2.nodes == rFull.nodes && r2.edges == rFull.edges &&
      r2.entities == rFull.entities && r2.triples == rFull.triples)

    // retry after FULL completion is a pure no-op (no version bump)
    val vBefore = Snapshots.versions(inc, "edges")
    val rRetry = Pipeline.runIncrementalPinned(spark, c.toDS(), inc,
      "icc-d2", cfg)
    assert(Snapshots.versions(inc, "edges") == vBefore)
    assert(rRetry.copy(runId = "x") == r2.copy(runId = "x"))

    // crash-retry HALF-APPLIED: nodes+edges manifests lost after the
    // assign patch published → the retry must heal through the global
    // tail (the pair graph is only derivable pre-patch) and still
    // equal the from-scratch graph
    val inc2 = tmpDir("icc2")
    Pipeline.run(spark, a.toDS(), inc2, "icc-base", cfg)
    Pipeline.pinEpoch(spark, inc2, "icc-pin", cfg)
    Pipeline.runIncrementalPinned(spark, b.toDS(), inc2, "icc-d1", cfg)
    Files.delete(Path.of(Snapshots.stageDir(inc2, "nodes"), "_MANIFEST.json"))
    Files.delete(Path.of(Snapshots.stageDir(inc2, "edges"), "_MANIFEST.json"))
    val rHeal = Pipeline.runIncrementalPinned(spark, b.toDS(), inc2,
      "icc-d1", cfg)
    val fullAb = tmpDir("icc-fullab")
    Pipeline.run(spark, (a ++ b).toDS(), fullAb, "icc-fab", cfg)
    assert(nodeSet(inc2) == nodeSet(fullAb))
    assert(edgeSet(inc2) == edgeSet(fullAb))
    assert(rHeal.nodes == Snapshots.readManifest(fullAb, "nodes").rows)

    // incrementalCanon=false forces the global tail (the A/B lever):
    // same graph, full rewrite
    val inc3 = tmpDir("icc3")
    Pipeline.run(spark, a.toDS(), inc3, "icc-base", cfg)
    Pipeline.pinEpoch(spark, inc3, "icc-pin", cfg)
    Pipeline.runIncrementalPinned(spark, b.toDS(), inc3, "icc-d1",
      cfg.copy(incrementalCanon = false))
    assert(!Snapshots.readManifest(inc3, "nodes").metrics.contains("patched"))
    assert(nodeSet(inc3) == nodeSet(fullAb))
  }

  test("compactAppendFrac folds the tail tables after a pinned ingest; chain stays exact") {
    def f(name: String, forms: Seq[String]) = SourceFile("r", name, "c0",
      "md", forms.map(w => s"q: $w?").mkString("\n"))
    val classes = (0 until 40).map(i => s"cword$i")
    val a = classes.zipWithIndex.map { case (w, i) => f(s"a$i.txt", Seq(w)) }
    val b = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 0 => f(s"b$i.txt", Seq(w.toUpperCase))
    } :+ f("bnew.txt", Seq("cbrandnew1"))
    val c = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 1 => f(s"c$i.txt", Seq(w + "."))
    } :+ f("cnew.txt", Seq("cbrandnew2"))
    // frac ~0: fold whenever a patched stage holds ANY append rows
    val cfg = Pipeline.Config(canonBuckets = Some(64),
      arrangePartitions = Some(4), compactAppendFrac = Some(1e-9))
    val inc = tmpDir("icfold")
    Pipeline.run(spark, a.toDS(), inc, "if-base", cfg)
    Pipeline.pinEpoch(spark, inc, "if-pin", cfg)
    Pipeline.runIncrementalPinned(spark, b.toDS(), inc, "if-d1", cfg)
    // delta 1 appended new entities → the trigger folded; append mass
    // and set count are zero and the fold is stamped
    Seq("assign", "nodes", "edges").foreach { st =>
      val m = Snapshots.readManifest(inc, st)
      assert(m.metrics.get("compacted").contains("true"), s"$st not folded")
      assert(Snapshots.appendStats(m) == (0L, 0), st)
      assert(m.baseFiles.forall(_.isEmpty), st)
    }
    // a second pinned ingest PATCHES cleanly on top of the folded
    // snapshots, then folds again
    val r2 = Pipeline.runIncrementalPinned(spark, c.toDS(), inc, "if-d2", cfg)
    assert(Snapshots.readManifest(inc, "assign").metrics
      .get("compacted").contains("true"))
    val full = tmpDir("icfold-full")
    val rFull = Pipeline.run(spark, (a ++ b ++ c).toDS(), full, "if-full",
      cfg.copy(compactAppendFrac = None))
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(r2.nodes == rFull.nodes && r2.edges == rFull.edges)
  }

  test("lineage consolidation bounds the per-ingest union width; chain stays exact") {
    def f(name: String, forms: Seq[String]) = SourceFile("r", name, "c0",
      "md", forms.map(w => s"q: $w?").mkString("\n"))
    val classes = (0 until 30).map(i => s"lword$i")
    val a = classes.zipWithIndex.map { case (w, i) => f(s"a$i.txt", Seq(w)) }
    val deltas = (0 until 3).map { d =>
      classes.zipWithIndex.collect {
        case (w, i) if i % 3 == d => f(s"d$d-$i.txt",
          Seq(if (d == 0) w.toUpperCase else w + ("." * d)))
      } :+ f(s"dnew$d.txt", Seq(s"lbrand$d"))
    }
    def chain(maxDeltas: Option[Int]): (String, Pipeline.Result) = {
      val cfg = Pipeline.Config(canonBuckets = Some(64),
        arrangePartitions = Some(4), maxLineageDeltas = maxDeltas)
      val dir = tmpDir(s"lin${maxDeltas.isDefined}")
      Pipeline.run(spark, a.toDS(), dir, "lc-base", cfg)
      Pipeline.pinEpoch(spark, dir, "lc-pin", cfg)
      var r: Pipeline.Result = null
      deltas.zipWithIndex.foreach { case (delta, i) =>
        r = Pipeline.runIncrementalPinned(spark, delta.toDS(), dir,
          s"lc-d$i", cfg)
      }
      (dir, r)
    }
    val (inc, r) = chain(Some(1))
    val (incN, rN) = chain(None)

    // the maintained chain's lineage stayed short: consolidation at
    // each ingest start folds completed deltas, so at most
    // [consolidated full, the latest ingest's delta] remain — while
    // the unmaintained chain accumulated base + 3 deltas
    Seq("entities", "link_edges", "ep_keys", "ep_shingles").foreach { st =>
      val vs = Snapshots.versions(inc, st)
      assert(vs.length <= 2, s"$st lineage not consolidated: $vs")
      assert(Snapshots.versions(incN, st).length == 4, st)
      val live = Snapshots.readManifestVersion(inc, st, vs.head)
      if (vs.length == 2)
        assert(live.metrics.get("compacted").contains("true"), st)
    }
    // identical graphs and result counts on both chains
    assert(nodeSet(inc) == nodeSet(incN))
    assert(edgeSet(inc) == edgeSet(incN))
    assert(r.copy(runId = "x") == rN.copy(runId = "x"))

    // retry of the last ingest is still a no-op (idempotence survives
    // consolidation of PRIOR runs; the in-flight guard protects its
    // own slices)
    val vBefore = Snapshots.versions(inc, "edges")
    val rRetry = Pipeline.runIncrementalPinned(spark,
      deltas(2).toDS(), inc, "lc-d2",
      Pipeline.Config(canonBuckets = Some(64),
        arrangePartitions = Some(4), maxLineageDeltas = Some(1)))
    assert(Snapshots.versions(inc, "edges") == vBefore)
    assert(rRetry.copy(runId = "x") == r.copy(runId = "x"))

    // a FOREIGN crashed ingest (entities slice published, no tail
    // commit record) must never be folded: its retry's idempotence
    // key and oldUnion exclusion live on that slice
    Snapshots.stage(spark, inc, "entities", "lc-crashed",
      resume = false, metrics = Map("delta" -> "true")) {
      Snapshots.read(spark, inc, "entities").limit(0)
    }
    val entBefore = Snapshots.versions(inc, "entities")
    val folded = Pipeline.compactLineage(spark, inc, "lc-d3", 1)
    assert(!folded.contains("entities"),
      "an uncommitted foreign slice must block entities consolidation")
    assert(Snapshots.versions(inc, "entities") == entBefore,
      "the crashed slice must survive untouched")
  }

  test("deferred merges: append-only ingests + canon log equal CoW and from-scratch; fold applies the log") {
    def f(name: String, forms: Seq[String]) = SourceFile("r", name, "c0",
      "md", forms.map(w => s"q: $w?").mkString("\n"))
    val classes = (0 until 60).map(i => s"dword$i")
    val a = classes.zipWithIndex.map { case (w, i) => f(s"a$i.txt", Seq(w)) }
    val b = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 0 => f(s"b$i.txt", Seq(w.toUpperCase))
    } :+ f("bnew.txt", Seq("dbrandnew1"))
    // delta 2 merges across BOTH prior ingests: dot-variants of odd
    // base classes AND re-mentions of delta-1's upper variants (their
    // components merged an ingest ago — exercises log COMPOSITION)
    val c = classes.zipWithIndex.collect {
      case (w, i) if i % 2 == 1 => f(s"c$i.txt", Seq(w + ".") ++
        (if (i % 5 == 0) Seq(classes(14).toUpperCase) else Nil))
    } :+ f("cnew.txt", Seq("dbrandnew2"))
    val cfgD = Pipeline.Config(canonBuckets = Some(64),
      arrangePartitions = Some(4), deferMerges = true)

    val inc = tmpDir("defer")
    Pipeline.run(spark, a.toDS(), inc, "df-base", cfgD)
    Pipeline.pinEpoch(spark, inc, "df-pin", cfgD)
    val r1 = Pipeline.runIncrementalPinned(spark, b.toDS(), inc, "df-d1",
      cfgD)
    val r2 = Pipeline.runIncrementalPinned(spark, c.toDS(), inc, "df-d2",
      cfgD)

    // the ingests really DEFERRED: zero rewritten dirs, append-only
    // patches, a dirty log with real merges
    Seq("assign", "nodes", "edges").foreach { st =>
      val m = Snapshots.readManifest(inc, st)
      assert(m.metrics.get("defer").contains("true"), s"$st not deferred")
      assert(m.metrics("rewrittenDirs") == "0", st)
      assert(m.metrics.get("patched").contains("true"), st)
    }
    assert(Pipeline.canonLogDirty(inc))
    val logRows = Snapshots.readManifest(inc, Pipeline.CanonLogStage).rows
    assert(logRows > 10, s"expected real merges in the log, got $logRows")
    assert(r1.nodes == 61 && r2.nodes == 62,
      s"logical-node arithmetic drifted: ${r1.nodes}/${r2.nodes}")

    // resolved graph equals the from-scratch run; stored node ROWS
    // over-count merged components (that is what deferral defers),
    // while Result.nodes carries the exact logical count
    val full = tmpDir("defer-full")
    val rFull = Pipeline.run(spark, (a ++ b ++ c).toDS(), full, "df-full",
      cfgD)
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(r2.nodes == rFull.nodes && r2.edges == rFull.edges)
    assert(r1.nodes > 0 && r1.nodes <= r2.nodes)
    val physicalRows = Snapshots.read(spark, inc, "nodes").count()
    assert(physicalRows > r2.nodes,
      s"deferral should leave constituent rows: $physicalRows vs ${r2.nodes}")

    // FOLD: applies the log physically, clears it, preserves the graph
    val folded = Pipeline.compactTail(spark, inc, "df-maint", 1e-9)
    assert(folded.toSet == Set("assign", "nodes", "edges"))
    assert(!Pipeline.canonLogDirty(inc))
    assert(nodeSet(inc) == nodeSet(full))
    assert(edgeSet(inc) == edgeSet(full))
    assert(Snapshots.read(spark, inc, "nodes").count() == r2.nodes)
    assert(Snapshots.readManifest(inc, "nodes").rows == r2.nodes)

    // a further deferred ingest on the folded base still works
    val d = Seq(f("dnew.txt", Seq(classes(3), "dbrandnew3")))
    val r3 = Pipeline.runIncrementalPinned(spark, d.toDS(), inc, "df-d3",
      cfgD)
    val full2 = tmpDir("defer-full2")
    Pipeline.run(spark, (a ++ b ++ c ++ d).toDS(), full2, "df-full2", cfgD)
    assert(nodeSet(inc) == nodeSet(full2))
    assert(r3.edges == Snapshots.readManifest(full2, "edges").rows)

    // a COPY-ON-WRITE ingest refuses to run over a dirty log: it heals
    // through the global tail, which clears the log
    val inc2 = tmpDir("defer-cow")
    Pipeline.run(spark, a.toDS(), inc2, "df-base", cfgD)
    Pipeline.pinEpoch(spark, inc2, "df-pin", cfgD)
    Pipeline.runIncrementalPinned(spark, b.toDS(), inc2, "df-d1", cfgD)
    assert(Pipeline.canonLogDirty(inc2))
    Pipeline.runIncrementalPinned(spark, c.toDS(), inc2, "df-d2",
      cfgD.copy(deferMerges = false))
    assert(!Pipeline.canonLogDirty(inc2),
      "the global tail must clear the stale log")
    assert(!Snapshots.readManifest(inc2, "nodes").metrics.contains("defer"))
    assert(nodeSet(inc2) == nodeSet(full))
    assert(edgeSet(inc2) == edgeSet(full))
  }

  test("census drift: measured per pinned ingest, refuses a stale epoch, re-pin recovers") {
    val all = FilesGen.local(n)
    val (a, rest) = all.splitAt(n / 2)
    val (b, c) = rest.splitAt(n / 4)
    // cap = 1: any shingle reaching df 2 flips hot — on this long-tail
    // fixture the delta re-mentions base singleton shingles, so the
    // fresh census MUST diverge from the pinned one (drift > 0)
    def cfgT(drift: Option[Double]) = Pipeline.Config(
      link = graft.link.Linking.Config(exactSmallThreshold = 0L,
        maxShingleDf = 1L, maxShingleDfFrac = 1e-12),
      maxCensusDrift = drift)
    val dir = tmpDir("drift")
    Pipeline.run(spark, a.toDS(), dir, "dr-base", cfgT(None))
    Pipeline.pinEpoch(spark, dir, "dr-pin", cfgT(None))

    // a zero-tolerance bound refuses the ingest and names the recovery
    val ex = intercept[IllegalArgumentException] {
      Pipeline.runIncrementalPinned(spark, b.toDS(), dir, "dr-d1",
        cfgT(Some(0.0)))
    }
    assert(ex.getMessage.contains("census drift") &&
      ex.getMessage.contains("pinEpoch"), ex.getMessage)

    // recovery exactly as the message prescribes: the SAME runId
    // through the global relink (idempotent extract — the refused
    // ingest's delta is reused, not re-extracted), then re-pin
    assert(Snapshots.versions(dir, "extract").length == 2)
    Pipeline.runIncremental(spark, b.toDS(), dir, "dr-d1", cfgT(None))
    assert(Snapshots.versions(dir, "extract").length == 2, "no re-extract")
    val fullAb = tmpDir("drift-fullab")
    Pipeline.run(spark, (a ++ b).toDS(), fullAb, "dr-fab", cfgT(None))
    assert(nodeSet(dir) == nodeSet(fullAb) && edgeSet(dir) == edgeSet(fullAb))

    // after the re-pin, a further pinned ingest runs under the fresh
    // census, records its drift, and equals from-scratch-under-census
    Pipeline.pinEpoch(spark, dir, "dr-pin2", cfgT(None))
    val hot2 = Snapshots.read(spark, dir, "ep_census")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Pipeline.runIncrementalPinned(spark, c.toDS(), dir, "dr-d2",
      cfgT(Some(1.0)))
    val keysV = Snapshots.versions(dir, "ep_keys").last
    val drift = Snapshots.readManifestVersion(dir, "ep_keys", keysV)
      .metrics("censusDrift").toDouble
    assert(drift >= 0.0 && drift <= 1.0)
    val full = tmpDir("drift-full")
    Pipeline.run(spark, all.toDS(), full, "dr-full",
      cfgT(None).copy(link = cfgT(None).link.copy(pinnedHot = Some(hot2))))
    assert(nodeSet(dir) == nodeSet(full) && edgeSet(dir) == edgeSet(full))
  }

  test("key-sampled census drift: deterministic, unbiased vs exact, metric-only") {
    val all = FilesGen.local(n)
    val (a, b) = all.splitAt(n / 2)
    val cfg0 = Pipeline.Config(
      link = graft.link.Linking.Config(exactSmallThreshold = 0L,
        maxShingleDf = 1L, maxShingleDfFrac = 1e-12))
    val base = tmpDir("driftsamp")
    Pipeline.run(spark, a.toDS(), base, "ds-base", cfg0)
    Pipeline.pinEpoch(spark, base, "ds-pin", cfg0)

    def copyOf(tag: String): String = {
      val dst = tmpDir(tag)
      val src = Path.of(base)
      Files.walk(src).iterator().asScala.foreach { p =>
        val t = Path.of(dst).resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      dst
    }
    def ingest(dir: String, sample: Double): Double = {
      Pipeline.runIncrementalPinned(spark, b.toDS(), dir, "ds-d1",
        cfg0.copy(driftSample = sample))
      val v = Snapshots.versions(dir, "ep_keys").last
      Snapshots.readManifestVersion(dir, "ep_keys", v)
        .metrics("censusDrift").toDouble
    }

    // copies of the PINNED state, taken before any ingest (an ingest
    // with a runId the copy has seen would resume as a no-op)
    val (d2, d3, d4) = (copyOf("ds2"), copyOf("ds3"), copyOf("ds4"))
    val exact = ingest(base, 1.0)
    // cap = 1 on the long-tail fixture: the delta re-mentions base
    // singleton shingles, so exact drift must be strictly positive
    assert(exact > 0.0)
    val s2 = ingest(d2, 0.5)
    val s3 = ingest(d3, 0.5)
    // deterministic: the key sample is a hash bucket, not an RNG —
    // a replayed ingest records the same drift
    assert(s2 == s3)
    // unbiased: a 50% key sample with EXACT per-key dfs lands near
    // the exact fraction (row-sampling read ~9x high here)
    assert(math.abs(s2 - exact) <= 0.15,
      s"sampled drift $s2 too far from exact $exact")
    // degenerate sample -> no keys priced -> drift 0.0, ingest fine
    assert(ingest(d4, 1e-9) == 0.0)
    // sampling affects the METRIC only: graphs identical
    assert(nodeSet(d2) == nodeSet(base) && edgeSet(d2) == edgeSet(base))
    Seq(base, d2, d3, d4).foreach(d => deleteRec(Path.of(d)))
  }

  test("re-run with resume is a no-op yielding identical results") {
    val dir = tmpDir("c")
    val r1 = Pipeline.run(spark, files, dir, "run-c")
    val manifestTimes = Pipeline.Stages.map(s =>
      Files.getLastModifiedTime(
        Path.of(Snapshots.stageDir(dir, s), "_MANIFEST.json")))
    val r2 = Pipeline.run(spark, files, dir, "run-c2")
    val manifestTimes2 = Pipeline.Stages.map(s =>
      Files.getLastModifiedTime(
        Path.of(Snapshots.stageDir(dir, s), "_MANIFEST.json")))
    assert(manifestTimes == manifestTimes2, "resume must not rewrite stages")
    assert(r1.copy(runId = "x", ccIterations = 0) ==
      r2.copy(runId = "x", ccIterations = 0))
  }

  test("quarantined docs carry through: guard config quarantines and excludes") {
    val dir = tmpDir("d")
    val res = Pipeline.run(spark, files, dir, "run-d",
      Pipeline.Config(extraction =
        graft.extract.Extraction.Config(tokenLimit = 2000)))
    assert(res.quarantined > 0)
    val subjects = Snapshots.read(spark, dir, "edges")
      .select("subj").distinct().as[String].collect().toSet
    val oversize = FilesGen.local(n)
      .filter(f => GoldenOracle.tokens(f.content) > 2000)
      .map(f => s"${f.repo}/${f.path}").toSet
    assert(oversize.nonEmpty && subjects.intersect(oversize).isEmpty)
  }
}
