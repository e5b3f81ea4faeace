package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Merge-on-read row-level DML: a small DELETE/UPDATE publishes a
  * deletion-vector commit — ZERO data files rewritten — with the mask
  * applied by every reader (snapshot, pruned reads, change feed, counts)
  * and materialized by reorg/compact. Bulk mutations still take the
  * copy-on-write path. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, off: Int = 0) =
    (1 to n).map(i => (i.toLong + off, s"u${i + off}", i * 1.5)).toDF("id", "name", "v")

  private def dataFiles(t: GraftTable): Set[String] = {
    val fs = new Path(t.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = new Path(t.root, "data")
    if (!fs.exists(dataDir)) Set.empty
    else (for (d <- fs.listStatus(dataDir).toSeq; f <- fs.listStatus(d.getPath))
      yield s"data/${d.getPath.getName}/${f.getPath.getName}").toSet
  }

  test("a one-row DELETE writes zero data files and the row is gone") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(100).repartition(4))
    val before = dataFiles(t)
    val v = t.delete($"id" === 42L)
    assert(dataFiles(t) == before,
      "a DV delete must not write or remove any data file")
    assert(t.activeFiles(v).toSet == t.activeFiles(1L).toSet,
      "the active paths are unchanged; only the dv tags moved")
    assert(t.snapshot().count() == 99)
    assert(t.snapshot().filter($"id" === 42L).count() == 0)
    // time travel still sees the pre-delete row
    assert(t.snapshot(Some(1L)).count() == 100)
    // metadata-only count honors the mask
    assert(t.fastCount() == 99)
  }

  test("successive DV deletes merge; a fully-deleted file leaves the active set") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(10).coalesce(1))
    t.delete($"id" <= 4L)
    assert(t.snapshot().count() == 6)
    t.delete($"id" <= 8L) // overlaps the first mask
    assert(t.snapshot().count() == 2)
    assert(t.fastCount() == 2)
    val v = t.delete($"id" > 0L) // everything: the file itself must drop
    assert(t.activeFiles(v).isEmpty, "a fully-masked file must leave the set")
    assert(t.snapshot().count() == 0)
  }

  test("UPDATE via DV: masked old rows + appended new rows, untouched files carry over") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(50).repartition(2))
    val before = dataFiles(t)
    t.update($"id" === 7L, Map("name" -> lit("renamed")))
    val after = dataFiles(t)
    assert(before.subsetOf(after), "no original file may be rewritten")
    assert((after -- before).nonEmpty, "the updated copies append as new files")
    val got = t.snapshot().filter($"id" === 7L).select($"name").as[String].collect()
    assert(got.toSeq == Seq("renamed"))
    assert(t.snapshot().count() == 50)
  }

  test("a bulk delete falls back to copy-on-write") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"),
      dvMaxRows = 5)
    t.append(rows(100).repartition(2))
    val before = dataFiles(t)
    t.delete($"id" <= 50L) // 50 rows > dvMaxRows=5
    assert(t.snapshot().count() == 50)
    assert(t.entries(t.latestVersion.get).forall(_.dvRef.isEmpty),
      "bulk deletes must rewrite, not accumulate giant DVs")
    assert((dataFiles(t) -- before).nonEmpty, "COW writes replacement files")
  }

  test("pruned reads (snapshotWhere / snapshotRange) apply the mask") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"),
      statsCol = Some("id"))
    t.append(rows(100).repartitionByRange(4, $"id"))
    t.delete($"id" === 10L)
    assert(t.snapshotRange(1L, 20L).count() == 19)
    assert(t.snapshotWhere($"id" >= 1L && $"id" <= 20L).count() == 19)
    assert(t.snapshotWhere($"id" === 10L).count() == 0)
  }

  test("the change feed states a DV delete as delete rows, O(delta)") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(30).repartition(3))
    val v1 = 1L
    val v2 = t.delete($"id".isin(3L, 17L))
    val feed = t.changeFeed(v1, v2)
    val dels = feed.filter($"_change" === "delete").select($"id").as[Long].collect()
    assert(dels.sorted.toSeq == Seq(3L, 17L))
    assert(feed.filter($"_change" === "insert").count() == 0)
  }

  test("reorg materializes DVs: only masked files rewrite, mask cleared") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(40).repartition(4))
    t.delete($"id" === 1L)
    val masked = t.entries(2L).filter(_.dvRef.isDefined).map(_.path).toSet
    val clean = t.entries(2L).filterNot(_.dvRef.isDefined).map(_.path).toSet
    assert(masked.nonEmpty && clean.nonEmpty, "test needs a mixed active set")
    val v = t.reorg()
    val es = t.entries(v)
    assert(es.forall(_.dvRef.isEmpty), "reorg clears every DV")
    assert(clean.subsetOf(es.map(_.path).toSet), "clean files carry over verbatim")
    assert(es.map(_.path).toSet.intersect(masked).isEmpty, "masked files rewrote")
    assert(t.snapshot().count() == 39)
  }

  test("appendUnique lands each key once; the probe prunes through the indexes") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_appuniq"),
      bloomCol = Some("id"), statsCol = Some("id"))
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "name")
      .repartitionByRange(4, $"id"))
    // overlap: 50 existing + 50 new
    t.appendUnique((51L to 150L).map(i => (i, s"w$i")).toDF("id", "name"), "id")
    assert(t.snapshot().count() == 150)
    // the original rows won: key 60 keeps its first-landed payload
    assert(t.snapshot().filter($"id" === 60L).select($"name")
      .as[String].head() == "v60")
    // full re-delivery adds nothing
    t.appendUnique((1L to 150L).map(i => (i, s"x$i")).toDF("id", "name"), "id")
    assert(t.snapshot().count() == 150)
    assert(t.fastCount() == 150)
    // within-batch duplicates collapse too
    t.appendUnique(Seq((200L, "a"), (200L, "b")).toDF("id", "name"), "id")
    assert(t.snapshot().filter($"id" === 200L).count() == 1)
    // the small-batch probe is a point-set predicate the indexes prune:
    // a probe for one fresh key must not touch every file
    val all = t.activeFiles(t.latestVersion.get).size
    assert(t.filesForPredicate($"id".isin(60L)).size < all,
      "the existing-key probe must prune through windows/blooms")
  }

  test("racing appendUnique calls with the same key land it exactly once") {
    // serializable uniqueness: the commit version pins the probed
    // snapshot, so the loser recomputes its anti-join against the
    // winner's commit instead of blind-append-rebasing a duplicate in
    val t = new GraftTable(spark, graft.TempDirs.create("graft_appuniq_race"),
      bloomCol = Some("id"))
    t.append((1L to 50L).map(i => (i, s"v$i")).toDF("id", "name"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val t2 = GraftTable.load(spark, t.root)
    try {
      Seq(t, t2).map { h =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            barrier.await()
            // both writers deliver key 100 (plus a writer-unique key)
            h.appendUnique(Seq((100L, s"w${h.hashCode}"),
              (1000L + h.hashCode.toLong.abs % 100L, "u"))
              .toDF("id", "name"), "id")
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    val fresh = GraftTable.load(spark, t.root)
    assert(fresh.snapshot().filter($"id" === 100L).count() == 1L,
      "a racing appendUnique must not land the shared key twice")
    assert(fresh.snapshot().groupBy($"id").count()
      .filter($"count" > 1).count() == 0L)
  }

  test("the read-side mask is an executor-loaded codegen filter: no join, no driver literal") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(2000).repartition(4))
    (1 to 5).foreach(i => t.delete($"id" === i.toLong * 10L))
    val plan = t.snapshot().queryExecution.optimizedPlan.toString()
    // the positions load in EXECUTORS from the .dvs sidecars (DvMasked
    // expression): the plan must carry neither a LocalRelation (driver-
    // assembled mask) nor any Join (broadcast anti-join shape) — just
    // the parquet scan under one codegen filter
    assert(!plan.contains("LocalRelation"),
      s"DV mask embedded in the plan as a local relation:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"DV mask must be a filter, not a join:\n$plan")
    assert(plan.toLowerCase.contains("dvmasked"),
      s"expected the DvMasked filter in the plan:\n$plan")
    // `*(N)` marks whole-stage-codegen membership in the executed plan
    val exec = t.snapshot().queryExecution.executedPlan.toString()
    assert(exec.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("dvmasked") && l.contains("*(")),
      s"the DV filter must stay inside codegen:\n$exec")
    assert(t.snapshot().count() == 1995)
  }

  test("accumulated DV debt auto-purges past the dvPurgeRows bound") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"),
      dvPurgeRows = 20L)
    t.append(rows(500).repartition(4))
    var purges = 0
    (1 to 50).foreach { i =>
      t.delete($"id" === i.toLong)
      val masked = t.detailDF.select($"dv_masked_rows").head().getLong(0)
      assert(masked <= 21L, s"mask grew past the purge bound: $masked")
      if (masked == 0L && i > 1) purges += 1
    }
    assert(purges >= 1, "the threshold purge never fired")
    assert(t.snapshot().count() == 450)
    assert(t.fastCount() == 450)
    // history shows the interleaved reorg commits
    assert(t.history().exists(_.op == "reorg"))
  }

  test("a DV commit pins its version: racers collide loudly, never silently drop") {
    // hammer one table from two writers — DV deletes vs appends — each
    // wrapped in the standard rebase loop. With the version pinned before
    // the distributed scan, a lost race is a ConcurrentCommitException
    // (retried); nothing is ever silently un-committed.
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(100).coalesce(1))
    val t2 = GraftTable.load(spark, t.root)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val deleter = new Thread(() =>
      try (1 to 8).foreach { i =>
        t.commitWithRetry(50)(t.delete($"id" === i.toLong))
      } catch { case e: Throwable => errs.add(e) })
    val appender = new Thread(() =>
      try (1 to 8).foreach { i =>
        t2.commitWithRetry(50)(t2.append(rows(1, 1000 + i).coalesce(1)))
      } catch { case e: Throwable => errs.add(e) })
    deleter.start(); appender.start()
    deleter.join(120000); appender.join(120000)
    assert(errs.isEmpty, s"concurrent DV/append writers failed: ${errs.peek()}")
    val fresh = GraftTable.load(spark, t.root)
    // every append survived (none silently dropped by a stale-base DV
    // commit) and every delete landed
    assert(fresh.snapshot().filter($"id" > 1000L).count() == 8,
      "an interleaved append's file was silently removed by a DV commit")
    assert(fresh.snapshot().filter($"id" <= 8L && $"id" >= 1L).count() == 0)
    assert(fresh.snapshot().count() == 100 - 8 + 8)
  }

  test("merge/apply rewrites respect existing DVs (no resurrection)") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_dv"))
    t.append(rows(20).coalesce(1))
    t.delete($"id" === 5L)
    // a COW-shaped merge rewrites the file: row 5 must stay gone
    t.merge(rows(2, 100), Seq("id"), Seq($"v".desc))
    assert(t.snapshot().filter($"id" === 5L).count() == 0,
      "a rewrite that reads masked files must apply the mask")
    assert(t.snapshot().count() == 21) // 19 survivors + 2 merged inserts
  }
}
