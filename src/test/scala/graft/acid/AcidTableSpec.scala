package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The commit-log table's ACID invariants, each pinned structurally:
  * exclusive commit (optimistic concurrency), snapshot isolation over
  * immutable files, orphan invisibility, vacuum retention, and the
  * streaming foreachBatch MERGE equaling the batch answer. */
class AcidTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): GraftTable =
    new GraftTable(spark, graft.TempDirs.create("graft_acid_spec"))

  private def rows(n: Int, off: Int = 0) =
    (1 to n).map(i => (i.toLong + off, s"u${i + off}", i * 1.5)).toDF("id", "name", "v")

  test("concurrent appends auto-resolve: both land, no data rewritten, no caller retry") {
    val t = freshTable()
    t.append(rows(2))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = t.append(rows(3, 100 * (i + 1)))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    // every append landed as its own version, nothing lost or doubled
    assert(t.versions == (1L to 5L))
    assert(t.snapshot().count() == 2 + 4 * 3)
    assert(t.snapshot().select($"id").as[Long].collect().distinct.length == 14)
    assert(t.history().count(_.op == "append") == 5)
  }

  test("a torn commit (manifest without the terminator) fails loudly, never reads as empty") {
    val t = freshTable()
    t.append(rows(3))
    // simulate a writer that crashed between the exclusive create and the
    // content write: an empty manifest claims version 2
    val torn = new org.apache.hadoop.fs.Path(t.root, "_log/v00000000000000000002.manifest")
    val fs = torn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(torn, false).close()
    val err = intercept[IllegalStateException] { t.snapshot(Some(2L)).count() }
    assert(err.getMessage.contains("incomplete"),
      s"a torn manifest must error, not parse as an empty table: ${err.getMessage}")
    // v1 (complete) stays readable
    assert(t.snapshot(Some(1L)).count() == 3)
  }

  test("exclusive commit: the second writer to a version loses with ConcurrentCommitException") {
    val t = freshTable()
    t.append(rows(3))
    // two writers both saw latest=1 and race to publish version 2
    val files = t.writeData(rows(2, 100), 2L)
    t.commit(2L, files)
    val loser = t.writeData(rows(2, 200), 2L)
    intercept[ConcurrentCommitException] { t.commit(2L, loser) }
    // the loser's data stayed invisible: version 2 is the winner's
    assert(t.snapshot(Some(2L)).count() == 2)
    assert(t.snapshot(Some(2L)).select($"id").as[Long].collect().toSet == Set(101L, 102L))
  }

  test("snapshot isolation: a resolved snapshot survives later overwrites unchanged") {
    val t = freshTable()
    t.append(rows(3))
    val v1 = t.snapshot(Some(1L))
    t.overwrite(rows(5, 1000))
    t.append(rows(2, 2000))
    // v1's files are immutable and still referenced by its manifest
    assert(v1.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(t.snapshot().count() == 7)
  }

  test("orphaned data files (crash before manifest) are invisible and vacuumed") {
    val t = freshTable()
    t.append(rows(3))
    val orphans = t.writeData(rows(10, 500), 99L).map(_.path) // no commit follows
    assert(orphans.nonEmpty)
    assert(t.snapshot().count() == 3, "orphans must not leak into reads")
    val removed = t.vacuum(retain = 1)
    assert(orphans.toSet.subsetOf(removed.toSet), s"vacuum missed orphans: $orphans")
    assert(t.snapshot().count() == 3)
  }

  test("vacuum keeps the retention window readable and bounds storage") {
    val t = freshTable()
    t.append(rows(3))          // v1
    t.overwrite(rows(4, 10))   // v2
    t.overwrite(rows(5, 20))   // v3
    val removed = t.vacuum(retain = 2)
    assert(t.versions == Seq(2L, 3L), "v1's manifest must be gone")
    assert(removed.nonEmpty, "v1's unshared files must be deleted")
    // both retained versions still read their exact content
    assert(t.snapshot(Some(2L)).count() == 4)
    assert(t.snapshot(Some(3L)).count() == 5)
    intercept[Exception] { t.snapshot(Some(1L)).count() }
  }

  test("append shares prior files instead of rewriting them") {
    val t = freshTable()
    t.append(rows(3))
    t.append(rows(2, 100))
    val v1 = t.activeFiles(1L).toSet
    val v2 = t.activeFiles(2L).toSet
    assert(v1.subsetOf(v2), "append must reference v1's files, not copy them")
    assert(v2.size > v1.size)
  }

  test("compact rewrites many small files into few, content-lossless and time-travelable") {
    val t = freshTable()
    (0 until 6).foreach(i => t.append(rows(2, i * 10)))
    val before = t.activeFiles(t.latestVersion.get)
    assert(before.size >= 6, "six appends should leave at least six files")
    val content = t.snapshot().select($"id").as[Long].collect().sorted.toSeq
    val v = t.compact(targetFiles = 1)
    assert(t.activeFiles(v).size == 1)
    assert(t.snapshot().select($"id").as[Long].collect().sorted.toSeq == content)
    // pre-compaction version still reads (old files untouched until vacuum)
    assert(t.snapshot(Some(v - 1)).count() == content.size)
  }

  test("change feed replay reconstructs any later version from an earlier one") {
    val t = freshTable()
    t.append(rows(4))                                    // v1
    t.overwrite(rows(3).union(rows(2, 100)))             // v2: drop id 4, add 101-102
    t.append(rows(1, 200))                               // v3: add 201
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"name", $"v").as[(Long, String, Double)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap // multiset
    // base ∪ inserts ∖ deletes, applied as multisets, must equal the target
    val feed = t.changeFeed(1L, 3L)
    val ins = rowSet(feed.filter($"_change" === "insert").drop("_change"))
    val del = rowSet(feed.filter($"_change" === "delete").drop("_change"))
    val base = rowSet(t.snapshot(Some(1L)))
    val replayed = (base.keySet ++ ins.keySet).map { k =>
      k -> (base.getOrElse(k, 0) + ins.getOrElse(k, 0) - del.getOrElse(k, 0))
    }.filter(_._2 > 0).toMap
    assert(replayed == rowSet(t.snapshot(Some(3L))),
      "v1 + inserts - deletes must reconstruct v3 exactly")
  }

  test("applyChanges keeps a downstream mirror in sync through rewrites") {
    val src = freshTable()
    val mirror = freshTable()
    src.append(rows(4))                                  // v1
    mirror.append(src.snapshot(Some(1L)))                // mirror seeded at v1
    src.merge(rows(2, 100).withColumn("v", lit(9.9)),    // v2: upsert
      Seq("id"), Seq($"v".desc))
    src.delete($"id" === 2L)                             // v3: erase id 2
    mirror.applyChanges(src.changeFeed(1L, 3L))
    def content(t: GraftTable) =
      t.snapshot().select($"id", $"name", $"v").as[(Long, String, Double)]
        .collect().sortBy(_._1).toSeq
    assert(content(mirror) == content(src),
      "mirror at v1 + feed(1,3) must equal the source at v3")
  }

  test("manifest stats skip non-overlapping files on range reads") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_skip"),
      statsCol = Some("id"))
    // three appends with DISJOINT id ranges: a clustered/ingest-ordered
    // table, the shape data skipping exists for
    Seq(0, 1000, 2000).foreach { off =>
      t.append(rows(100, off).repartition(2))
    }
    val all = t.activeFiles(t.latestVersion.get)
    val hit = t.filesForRange(1001L, 1050L)
    assert(hit.nonEmpty && hit.size < all.size,
      s"expected pruning: ${hit.size} of ${all.size} files")
    // every surviving file belongs to the middle commit's range
    val got = t.snapshotRange(1001L, 1050L).select($"id").as[Long].collect().sorted
    val want = t.snapshot().filter($"id" >= 1001 && $"id" <= 1050)
      .select($"id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // merge/compact rewrites keep the stats fresh (recomputed per write)
    t.compact(targetFiles = 3)
    val got2 = t.snapshotRange(1001L, 1050L).select($"id").as[Long].collect().sorted
    assert(got2.toSeq == want.toSeq)
  }

  test("clustered compaction restores skipping on a scattered table") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_cluster"),
      statsCol = Some("id"))
    // ingest order SCATTERS ids across files: interleave the three ranges
    // so every file's min/max window spans nearly the whole id space
    val scattered = rows(100).union(rows(100, 1000)).union(rows(100, 2000))
      .orderBy($"name") // u1, u10, u100, u1000... — decorrelates id order
      .repartition(6)
    t.append(scattered)
    val before = t.filesForRange(1001L, 1050L)
    assert(before.size == t.activeFiles(1L).size,
      "scattered layout should defeat skipping (every file overlaps)")
    // OPTIMIZE with range clustering: each file now owns a narrow range
    val v = t.compact(targetFiles = 6, clusterBy = Seq("id"))
    val after = t.filesForRange(1001L, 1050L, Some(v))
    assert(after.size < t.activeFiles(v).size,
      s"clustered layout must prune: ${after.size} of ${t.activeFiles(v).size}")
    val got = t.snapshotRange(1001L, 1050L).select($"id").as[Long].collect().sorted
    assert(got.toSeq == (1001L to 1050L).map(identity))
  }

  test("partition-scoped merge carries untouched partitions' files over verbatim") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_part"),
      partitionCol = Some("pid"))
    // 4 partitions x 25 rows; pid = id / 100 is functionally determined by
    // the merge key (id), satisfying the partition-scoped merge contract
    def part(p: Int, off: Int = 0) =
      (1 to 25).map(i => (p * 100L + i + off, p.toLong, s"u$p-$i", i * 1.0))
        .toDF("id", "pid", "name", "v")
    t.append(part(0).union(part(1)).union(part(2)).union(part(3)))
    val before = t.entries(t.latestVersion.get)
    assert(before.forall(_.part.isDefined), "every file needs a partition window")
    // merge touches ONLY partition 1
    val v = t.merge(part(1, 1000).withColumn("v", lit(99.0)),
      Seq("id"), Seq($"v".desc))
    val after = t.entries(v).map(_.path).toSet
    val untouched = before.filter(e =>
      e.part.exists { case (lo, hi) => hi < 1L || lo > 1L })
    assert(untouched.nonEmpty, "range clustering should isolate partition 1")
    assert(untouched.forall(e => after.contains(e.path)),
      "files outside the touched partition must carry over verbatim (zero I/O)")
    // rewritten partition-1 files are NEW paths (copy-on-write of the delta)
    val touchedOld = before.filter(e =>
      e.part.exists { case (lo, hi) => lo <= 1L && 1L <= hi }).map(_.path)
    assert(touchedOld.forall(p => !after.contains(p)))
    // content: partition 1 holds old ∪ new (disjoint ids), others unchanged
    assert(t.snapshot().count() == 125)
    assert(t.snapshot().filter($"pid" === 1L).count() == 50)
  }

  test("applyChanges rewrites only the feed's partitions; mirror matches source") {
    def part(p: Int) =
      (1 to 25).map(i => (p * 100L + i, p.toLong, s"u$p-$i", i * 1.0))
        .toDF("id", "pid", "name", "v")
    val src = new GraftTable(spark, graft.TempDirs.create("graft_acid_cdc_src"),
      partitionCol = Some("pid"))
    val mirror = new GraftTable(spark, graft.TempDirs.create("graft_acid_cdc_mir"),
      partitionCol = Some("pid"))
    src.append(part(0).union(part(1)).union(part(2)).union(part(3)))
    mirror.applyChanges(src.changeFeed(0L, 1L)
      .withColumn("_change", lit("insert")))  // seed: v0→v1 is all inserts
    val before = mirror.entries(mirror.latestVersion.get)
    assert(before.forall(_.part.isDefined))
    // source update confined to partition 2 → feed touches only pid=2
    val v2 = src.merge(part(2).withColumn("v", lit(42.0)),
      Seq("id"), Seq($"v".desc))
    val mv = mirror.applyChanges(src.changeFeed(1L, v2))
    val after = mirror.entries(mv).map(_.path).toSet
    val untouched = before.filter(e =>
      e.part.exists { case (lo, hi) => hi < 2L || lo > 2L })
    assert(untouched.nonEmpty, "range clustering should isolate partition 2")
    assert(untouched.forall(e => after.contains(e.path)),
      "apply must carry untouched partitions' files over verbatim (O(delta))")
    // the mirror's content equals the source's, exactly
    assert(mirror.snapshot().exceptAll(src.snapshot()).isEmpty &&
           src.snapshot().exceptAll(mirror.snapshot()).isEmpty)
  }

  test("delete auto-routes to the partition-scoped path when the predicate pins it") {
    def part(p: Int) =
      (1 to 25).map(i => (p * 100L + i, p.toLong, s"u$p-$i", i * 1.0))
        .toDF("id", "pid", "name", "v")
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_autodel"),
      partitionCol = Some("pid"))
    t.append(part(0).union(part(1)).union(part(2)).union(part(3)))
    val before = t.entries(t.latestVersion.get)
    val v = t.delete($"pid" === 2L && $"v" > 5.0)
    val after = t.entries(v).map(_.path).toSet
    val untouched = before.filter(e =>
      e.part.exists { case (lo, hi) => hi < 2L || lo > 2L })
    assert(untouched.nonEmpty)
    assert(untouched.forall(e => after.contains(e.path)),
      "a pid-pinned delete must rewrite only pid-2 files")
    assert(t.snapshot().filter($"pid" === 2L).count() == 5)
    assert(t.snapshot().count() == 80)
    // IN-list pinning scopes too; unpinnable predicates stay correct
    val v3 = t.delete($"pid".isin(0L, 1L) && $"name".endsWith("-1"))
    assert(t.entries(v3).map(_.path).toSet
      .intersect(before.map(_.path).toSet).nonEmpty)
    assert(t.snapshot().count() == 78)
    t.delete($"v" > 24.0)   // no partition pin → full path, still right
    assert(t.snapshot().filter($"v" > 24.0).count() == 0)
  }

  test("deleteInPartitions rewrites only the impacted partition's files") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_pdel"),
      partitionCol = Some("pid"))
    def part(p: Int) =
      (1 to 20).map(i => (p * 100L + i, p.toLong, i * 1.0)).toDF("id", "pid", "v")
    t.append(part(0).union(part(1)).union(part(2)))
    val before = t.entries(t.latestVersion.get)
    val v = t.deleteInPartitions($"id" % 2 === 0, Seq(2L))
    val after = t.entries(v).map(_.path).toSet
    val untouched = before.filter(e =>
      e.part.exists { case (lo, hi) => hi < 2L || lo > 2L })
    assert(untouched.nonEmpty && untouched.forall(e => after.contains(e.path)))
    // partition 2 lost its even ids; partitions 0-1 intact
    assert(t.snapshot().filter($"pid" === 2L).count() == 10)
    assert(t.snapshot().filter($"pid" =!= 2L).count() == 40)
  }

  test("change feed after an append scans only the appended files (O(delta))") {
    val t = freshTable()
    t.append(rows(100))            // v1
    t.append(rows(5, 1000))        // v2: small append
    val v1Files = t.activeFiles(1L).toSet
    val addedFiles = t.activeFiles(2L).toSet -- v1Files
    val feed = t.changeFeed(1L, 2L)
    // plan check: the diff must read ONLY the added files, never v1's
    val scanned = feed.inputFiles.map(f =>
      f.stripPrefix("file:").dropWhile(_ == '/').reverse.takeWhile(_ != '/').reverse).toSet
    val addedNames = addedFiles.map(f => f.split('/').last)
    val v1Names = v1Files.map(f => f.split('/').last)
    assert(scanned.subsetOf(addedNames), s"feed scanned beyond the delta: $scanned")
    assert(scanned.intersect(v1Names).isEmpty)
    // row semantics unchanged: 5 inserts, 0 deletes
    assert(feed.filter($"_change" === "insert").count() == 5)
    assert(feed.filter($"_change" === "delete").count() == 0)
  }

  test("per-file bloom prunes point lookups on a scattered (unclusterable) column") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_bloom"),
      bloomCol = Some("id"))
    // ids deliberately interleaved across files: every file's min/max
    // window spans the whole space, so range stats CANNOT prune here
    val ids = (1L to 600L)
    val scattered = ids.map(i => (i, s"u$i")).toDF("id", "name")
      .orderBy($"name").repartition(6)
    t.append(scattered)
    val all = t.activeFiles(t.latestVersion.get)
    assert(all.size >= 4, s"need several files, got ${all.size}")
    // a present key: bloom keeps only the file(s) that may contain it
    val hit = t.filesForPoint(137L)
    assert(hit.nonEmpty && hit.size < all.size,
      s"bloom must prune: ${hit.size} of ${all.size} files")
    val got = t.snapshotPoint(137L).select($"id", $"name")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((137L, "u137")))
    // an absent key: with high probability no file passes all 4 probes
    val missRows = t.snapshotPoint(999999L).count()
    assert(missRows == 0)
    // rewrites refresh the bloom (recomputed per write)
    t.append(Seq((5000L, "u5000")).toDF("id", "name"))
    assert(t.snapshotPoint(5000L).count() == 1)
  }

  test("delete + reorg + vacuum physically erases the rows (the compliance path)") {
    val t = freshTable()
    t.append(rows(10))
    t.delete($"id" % 2 === 0)
    // logically gone immediately (merge-on-read: the deletion vector
    // masks the rows at read; the bytes still exist)...
    assert(t.snapshot().select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
    // ...but still time-travelable (v1 retains the full set) until vacuum
    assert(t.snapshot(Some(1L)).count() == 10)
    // reorg materializes the DVs (rewrites only the masked files),
    // vacuum then drops every prior version's bytes — physical erasure
    t.reorg()
    t.vacuum(retain = 1)
    assert(t.versions == Seq(3L))
    // no surviving data file may contain an erased row, and no deletion
    // vector may survive either (the purge is physical, not a mask)
    assert(t.entries(3L).forall(_.dvRef.isEmpty), "reorg must clear DVs")
    val ids = t.activeFiles(3L)
      .flatMap(f => spark.read.parquet(s"${t.root}/$f")
        .select($"id").as[Long].collect())
    assert(ids.sorted == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("history records each commit's operation; snapshotAt time-travels by timestamp") {
    val t = freshTable()
    t.append(rows(3))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    t.merge(rows(2, 100), Seq("id"), Seq($"v".desc))
    t.delete($"id" === 1L)
    t.compact(targetFiles = 1)
    val h = t.history()
    assert(h.map(_.version) == Seq(1L, 2L, 3L, 4L))
    assert(h.map(_.op) == Seq("append", "merge", "delete", "compact"))
    assert(h.forall(_.commitMs > 0L))
    assert(h.map(_.commitMs) == h.map(_.commitMs).sorted, "monotone commit times")
    assert(h.last.nFiles == 1)
    // timestamp time travel: "as of just after v1" resolves to v1's content
    assert(t.snapshotAt(afterV1).select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    intercept[IllegalStateException] { t.snapshotAt(0L) }
  }

  test("CHECK constraints gate every write path and commit nothing on violation") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_acid_check"),
      constraints = Seq("v IS NOT NULL", "id > 0"))
    t.append(rows(3))                       // clean rows pass
    val bad = Seq((-1L, "neg", 1.0), (5L, "ok", 2.0)).toDF("id", "name", "v")
    val e = intercept[Exception] { t.append(bad) }
    assert(e.getMessage.contains("id > 0") && e.getMessage.contains("1 row(s)"))
    assert(t.versions == Seq(1L), "a violating append must commit NOTHING")
    // a FALSE constraint result violates (v IS NOT NULL on a null v) ...
    val nullV = Seq((7L, "n", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "name", "v")
    intercept[Exception] { t.overwrite(nullV) }
    // ... but a NULL constraint result PASSES — ANSI SQL / Delta CHECK
    // semantics: only FALSE violates (v > 0 over a null v is NULL)
    val t2 = new GraftTable(spark, graft.TempDirs.create("graft_acid_checknull"),
      constraints = Seq("v > 0"))
    t2.append(nullV)
    assert(t2.snapshot().count() == 1)
    // merge validates its updates too
    intercept[Exception] {
      t.merge(bad, Seq("id"), Seq($"v".desc))
    }
    assert(t.snapshot().count() == 3)
  }

  test("vacuumOlderThan drops pre-cutoff versions but never the latest") {
    val t = freshTable()
    t.append(rows(2))
    t.append(rows(2, 10))
    Thread.sleep(5)
    val cutoff = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(rows(2, 20))              // v3: the only post-cutoff commit
    t.vacuumOlderThan(cutoff)
    assert(t.versions == Seq(3L))
    assert(t.snapshot().count() == 6)  // latest content intact
    // cutoff in the future: still keeps the latest version
    t.vacuumOlderThan(System.currentTimeMillis() + 1000000L)
    assert(t.versions == Seq(3L))
  }

  test("commitWithRetry rebases concurrent writers so both land") {
    val t = freshTable()
    t.append(rows(3))
    // two writers race repeatedly: each appends 5 disjoint batches under
    // the retry loop; every lost race must rebase and still land
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (0 until 2).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            (0 until 5).foreach { i =>
              t.commitWithRetry(maxAttempts = 20) {
                t.append(rows(2, 1000 * (w + 1) + 10 * i))
              }
            }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    // all 10 appends landed exactly once on top of the base 3 rows
    assert(t.snapshot().count() == 3 + 10 * 2)
    assert(t.versions.size == 11, s"11 committed versions, got ${t.versions}")
  }

  test("streaming foreachBatch MERGE into the table equals the batch latest-per-key") {
    val t = freshTable()
    val input = MemoryStream[(Long, Long, Long, Double)](spark)
    val events = input.toDS().toDF("event_id", "user_id", "tsm", "value")
    val q = events.writeStream
      .option("checkpointLocation", graft.TempDirs.create("graft_acid_ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (t.versions.isEmpty) t.append(batch)
        else t.merge(batch, Seq("user_id"),
          Seq(col("tsm").desc, col("event_id").desc))
        ()
      }
      .start()
    try {
      input.addData((1L, 10L, 100L, 1.0), (2L, 20L, 200L, 2.0))
      q.processAllAvailable()
      input.addData((3L, 10L, 300L, 3.0), (4L, 30L, 50L, 4.0))
      q.processAllAvailable()
      input.addData((5L, 20L, 150L, 5.0)) // LATE for user 20: must lose
      q.processAllAvailable()
      val got = t.snapshot().select($"user_id", $"event_id", $"value")
        .as[(Long, Long, Double)].collect()
        .map { case (u, e, v) => u -> (e, v) }.toMap
      assert(got == Map(10L -> (3L, 3.0), 20L -> (2L, 2.0), 30L -> (4L, 4.0)))
    } finally q.stop()
  }
}
