package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPTIMIZE ZORDER BY on the commit-log table: after the interleaved-bit
  * rewrite, range reads on EITHER indexed column prune files from
  * manifest windows alone, and the rewrite is content-lossless. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // x and y are independent permutations, so a single-column sort could
  // cluster only one of them; z-order must narrow BOTH
  private def grid(n: Int) =
    (0 until n).map { i =>
      (i.toLong, ((i * 131) % n).toLong, ((i * 191) % n).toLong)
    }.toDF("id", "x", "y")

  test("z-order narrows per-file windows in both dimensions") {
    val t = new GraftTable(spark,
      graft.TempDirs.create("graft_zorder"),
      indexCols = Seq("x", "y"))
    t.append(grid(4096).repartition(8))  // ingest order scatters x and y
    t.compactZOrder(("x", "y"), targetFiles = 16)
    val all = t.activeFiles(t.latestVersion.get).size
    assert(all >= 12, s"expected ~16 files, got $all")
    // a 1/8 range in each dimension should hit a small fraction of files
    val hitX = t.filesForColumnRange("x", 0L, 511L).size
    val hitY = t.filesForColumnRange("y", 0L, 511L).size
    assert(hitX <= all / 2, s"x-range hit $hitX of $all files")
    assert(hitY <= all / 2, s"y-range hit $hitY of $all files")
    // and the pruned reads are exact
    assert(t.snapshotRangeOn("x", 0L, 511L).count() == 512L)
    assert(t.snapshotRangeOn("y", 100L, 199L).agg(sum($"id")).head().getLong(0) ==
      grid(4096).filter($"y".between(100, 199)).agg(sum($"id")).head().getLong(0))
  }

  test("3-D z-order narrows per-file windows in all three dimensions") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_zorder3"),
      indexCols = Seq("x", "y", "w"))
    val df = (0 until 4096).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, ((i * 191) % 4096).toLong,
        ((i * 73) % 4096).toLong)
    }.toDF("id", "x", "y", "w")
    t.append(df.repartition(8))
    t.compactZOrderN(Seq("x", "y", "w"), targetFiles = 27)
    val all = t.activeFiles(t.latestVersion.get).size
    Seq("x", "y", "w").foreach { c =>
      val hit = t.filesForColumnRange(c, 0L, 511L).size
      assert(hit < all, s"$c-range hit $hit of $all files")
    }
    // exactness on each dimension
    assert(t.snapshotRangeOn("w", 0L, 511L).count() == 512L)
    assert(t.snapshotWhere($"x" <= 511L && $"y" <= 511L && $"w" <= 511L).count() ==
      df.filter($"x" <= 511 && $"y" <= 511 && $"w" <= 511).count())
    // content-lossless
    assert(t.snapshot().count() == 4096L)
  }

  test("a STRING z-order dimension clusters by prefix code and still prunes") {
    // doc-id-shaped string keys whose order is scattered against the
    // numeric dims; the prefix-code dimension must cluster them so the
    // truncated string windows writeData records prune string predicates
    val t = new GraftTable(spark, graft.TempDirs.create("graft_zorder_str"),
      indexCols = Seq("x", "s"))
    val df = (0 until 4096).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, f"doc-${(i * 191) % 4096}%05d")
    }.toDF("id", "x", "s")
    t.append(df.repartition(8))
    t.compactZOrderN(Seq("x", "s"), targetFiles = 16)
    val all = t.activeFiles(t.latestVersion.get).size
    val hitX = t.filesForColumnRange("x", 0L, 511L).size
    assert(hitX <= all / 2, s"x-range hit $hitX of $all files")
    // string point + range predicates prune through the string windows
    val hitS = t.filesForPredicate($"s" === "doc-00300").size
    assert(hitS <= all / 2, s"string point hit $hitS of $all files")
    // the 8-byte prefix code drops the last digit of doc-DDDDD, so a
    // 1/8 range maps to ~1/8 of a coarser code space shared with the
    // x dimension — prunes to well under the full set, not to 1/8
    val hitSR = t.filesForPredicate($"s" >= "doc-01000" && $"s" <= "doc-01511").size
    assert(hitSR < all * 3 / 4, s"string range hit $hitSR of $all files")
    // and the pruned reads stay exact
    assert(t.snapshotWhere($"s" === "doc-00300").count() == 1L)
    assert(t.snapshotWhere($"s".between("doc-01000", "doc-01511")).count() == 512L)
    assert(t.snapshot().count() == 4096L, "layout must be content-lossless")
  }

  test("z-order rewrite is content-lossless and time-travelable") {
    val t = new GraftTable(spark,
      graft.TempDirs.create("graft_zorder_tt"),
      indexCols = Seq("x", "y"))
    t.append(grid(1000))
    t.compactZOrder(("x", "y"), targetFiles = 4)
    assert(t.snapshot().count() == 1000L)
    assert(t.snapshot().select(sum($"id")).head().getLong(0) == 499500L)
    assert(t.snapshot(Some(1L)).count() == 1000L) // pre-zorder version intact
    assert(t.history().last.op == "zorder")
  }

  test("INCREMENTAL zorder rewrites only the unclustered tail, O(tail) not O(table)") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_zorder_inc"),
      indexCols = Seq("x", "y"))
    t.append(grid(4096).repartition(8))
    t.compactZOrder(("x", "y"), targetFiles = 16)
    val laid = t.activeFiles(t.latestVersion.get).toSet
    // an ingest burst lands two SCATTERED files (windows span everything)
    val burst = (4096 until 4608).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, ((i * 191) % 4096).toLong)
    }.toDF("id", "x", "y")
    t.append(burst.repartition(2))
    // the incremental pass must carry every laid file verbatim and
    // rewrite only the burst
    val v = t.compactZOrderIncremental(Seq("x", "y"), targetFiles = 16)
    val after = t.activeFiles(v).toSet
    assert(laid.subsetOf(after),
      "already-clustered files must carry over verbatim")
    val rewritten = after -- laid
    assert(rewritten.nonEmpty && rewritten.size <= 4,
      s"the tail (512 of 4608 rows) must rewrite into a few files, got " +
        s"${rewritten.size}")
    assert(t.snapshot().count() == 4608L, "incremental layout is lossless")
    // pruning stays tight across BOTH generations
    val all = after.size
    assert(t.filesForColumnRange("x", 0L, 511L).size < all,
      "x-range pruning must survive the incremental pass")
    assert(t.snapshotRangeOn("x", 0L, 511L).count() ==
      (0 until 4608).count(i => (i * 131) % 4096 <= 511))
    // a second pass finds nothing unclustered: metadata-only commit
    val v2 = t.compactZOrderIncremental(Seq("x", "y"), targetFiles = 16)
    assert(t.activeFiles(v2).toSet == after, "steady state must be a no-op")
    // generational COALESCING: a tiny burst lays into a sliver file;
    // the next pass rewrites the NEXT burst together with that sliver,
    // so layout generations merge instead of accumulating
    def tiny(off: Int) = (off until off + 50).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, ((i * 191) % 4096).toLong)
    }.toDF("id", "x", "y")
    t.append(tiny(10000).coalesce(1))
    val v3 = t.compactZOrderIncremental(Seq("x", "y"), targetFiles = 16)
    val sliver = (t.activeFiles(v3).toSet -- after)
    assert(sliver.size == 1, s"a 50-row tail lays into one file: $sliver")
    t.append(tiny(20000).coalesce(1))
    val v4 = t.compactZOrderIncremental(Seq("x", "y"), targetFiles = 16)
    assert((t.activeFiles(v4).toSet & sliver).isEmpty,
      "the previous tiny generation must coalesce into the new pass")
    assert(t.snapshot().count() == 4708L)
    // an unwindowed dimension is rejected loudly
    assertThrows[IllegalArgumentException](
      t.compactZOrderIncremental(Seq("x", "id"), 16))
  }

  test("ALTER CLUSTER KEYS: metadata-only re-key, mixed-generation pruning, OPTIMIZE converges") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_recluster"),
      statsCol = Some("id"), indexCols = Seq("x", "y"))
    t.append(grid(4096).repartition(8))
    t.compactZOrder(("x", "y"), targetFiles = 16)
    val laid = t.activeFiles(t.latestVersion.get).toSet
    // re-pointing the cluster keys is METADATA-ONLY: files carry over
    t.alterClusterKeys(Seq("id", "y"))
    assert(t.activeFiles(t.latestVersion.get).toSet == laid,
      "cluster_keys must not rewrite data")
    assert(t.history().last.op == "cluster_keys")
    // a FRESH handle recovers the new key set from the log header and
    // windows the new dims on its writes
    val t2 = GraftTable.load(spark, t.root)
    val burst = (4096 until 4608).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, ((i * 191) % 4096).toLong)
    }.toDF("id", "x", "y")
    t2.append(burst.repartition(2))
    val all = t2.activeFiles(t2.latestVersion.get).size
    // OLD files still prune on the OLD dims (their w:x windows are
    // self-describing, the key switch cannot un-record them)
    assert(t2.filesForColumnRange("x", 0L, 255L).size < all,
      "old-dim pruning must survive the re-key")
    // the whole pre-switch table is untagged TAIL w.r.t. the new keys —
    // exactly what the incremental-optimize cadence keys on
    assert(t2.zorderTailShare(Seq("id", "y")).exists(_ > 0.99))
    // OPTIMIZE after the switch converges the layout tag to the new keys
    t2.compactZOrderIncremental(Seq("id", "y"), targetFiles = 16)
    assert(t2.zorderTailShare(Seq("id", "y")).contains(0.0),
      "the migration pass must converge the layout tag")
    val after = t2.activeFiles(t2.latestVersion.get).size
    // ...and the MIGRATED files prune on the NEW dims
    assert(t2.filesForColumnRange("id", 0L, 511L).size < after,
      "new-dim pruning must hold for migrated files")
    assert(t2.filesForColumnRange("y", 0L, 255L).size < after)
    assert(t2.snapshotRangeOn("id", 0L, 511L).count() == 512L)
    assert(t2.snapshot().count() == 4608L, "re-key + migration is lossless")
    // guards: unknown and column-mapped keys refuse
    intercept[IllegalArgumentException](t2.alterClusterKeys(Seq("nope")))
    t2.renameColumn("x", "xx") // x left the config at the re-key
    intercept[IllegalArgumentException](t2.alterClusterKeys(Seq("xx", "y")))
    // clearing the keys (CLUSTER BY NONE) persists too
    t2.alterClusterKeys(Nil)
    val t3 = GraftTable.load(spark, t2.root)
    intercept[IllegalArgumentException](t3.snapshotRangeOn("y", 0L, 10L))
  }

  test("SQL ALTER TABLE ... CLUSTER BY re-points the keys through the catalog") {
    val wh = graft.TempDirs.create("graft_recluster_cat")
    spark.conf.set("spark.sql.catalog.zc_cat", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.zc_cat.root", wh)
    spark.sql("CREATE TABLE zc_cat.t (id BIGINT, x BIGINT, y BIGINT) " +
      "USING graft TBLPROPERTIES ('indexCols'='x,y')")
    spark.sql("INSERT INTO zc_cat.t SELECT id, id * 131 % 512, id * 191 % 512 " +
      "FROM range(512)")
    spark.sql("ALTER TABLE zc_cat.t CLUSTER BY (id, y)")
    val t = GraftTable.load(spark, s"$wh/t")
    assert(t.history().last.op == "cluster_keys")
    // new writes window the new dims: the next insert's entries carry
    // w:id / w:y windows and prune via snapshotRangeOn
    spark.sql("INSERT INTO zc_cat.t SELECT id, id, id FROM range(512, 1024)")
    assert(t.snapshotRangeOn("id", 0L, 100L).count() == 101L)
    // CLUSTER BY NONE clears the set
    spark.sql("ALTER TABLE zc_cat.t CLUSTER BY NONE")
    val t2 = GraftTable.load(spark, s"$wh/t")
    intercept[IllegalArgumentException](t2.snapshotRangeOn("id", 0L, 1L))
  }

  test("a TIMESTAMP z-order dimension clusters in micros and both dims prune") {
    // ts and k are independent permutations over 4 "days" x 1024 keys —
    // the ts x tenant layout every time-series fact table wants
    def tsOf(i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime +
        ((i * 131) % 4096).toLong * 84375L) // ~4 days spread, sub-second steps
    val data = (0 until 4096).map(i =>
      (i.toLong, tsOf(i), ((i * 191) % 4096).toLong)).toDF("id", "ts", "k")
    val t = new GraftTable(spark, graft.TempDirs.create("graft_zorder_ts"),
      indexCols = Seq("ts", "k"))
    t.append(data.repartition(8))
    t.compactZOrderN(Seq("ts", "k"), targetFiles = 16)
    val all = t.activeFiles(t.latestVersion.get).size
    // a one-day ts range prunes through the tw: windows
    val lo = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-03-02 00:00:00")
    val tsPred = $"ts" >= lit(lo) && $"ts" < lit(hi)
    assert(t.filesForPredicate(tsPred).size <= all / 2,
      s"ts-range hit ${t.filesForPredicate(tsPred).size} of $all files")
    assert(t.snapshotWhere(tsPred).count() == data.filter(tsPred).count())
    // ...and the k dimension prunes simultaneously
    assert(t.filesForColumnRange("k", 0L, 511L).size <= all / 2)
    assert(t.snapshotRangeOn("k", 0L, 511L).count() == 512L)
    // INCREMENTAL: a scattered burst re-clusters into the SAME grid —
    // laid files carry over verbatim, content stays exact
    val laid = t.activeFiles(t.latestVersion.get).toSet
    val burst = (4096 until 4352).map(i =>
      (i.toLong, tsOf(i), ((i * 191) % 4096).toLong)).toDF("id", "ts", "k")
    t.append(burst.coalesce(1))
    t.compactZOrderIncremental(Seq("ts", "k"), targetFiles = 16)
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert(laid.subsetOf(after), "laid files must carry over verbatim")
    assert(t.snapshot().count() == 4352L)
    assert(t.snapshotWhere(tsPred).count() ==
      data.unionByName(burst).filter(tsPred).count())
  }

  test("HILBERT layout prunes both dimensions, is content-lossless, and keeps its own tag") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_hilbert"),
      indexCols = Seq("x", "y"))
    t.append(grid(4096).repartition(8))
    t.compactHilbertN(Seq("x", "y"), targetFiles = 16)
    assert(t.history().last.op == "hilbert")
    val all = t.activeFiles(t.latestVersion.get).size
    // both dimensions prune from the per-file windows, like z-order
    val hitX = t.filesForColumnRange("x", 0L, 511L).size
    val hitY = t.filesForColumnRange("y", 0L, 511L).size
    assert(hitX <= all / 2, s"x-range hit $hitX of $all files")
    assert(hitY <= all / 2, s"y-range hit $hitY of $all files")
    // content-lossless
    assert(t.snapshot().count() == 4096L)
    assert(t.snapshotRangeOn("x", 0L, 511L).count() == 512L)
    assert(t.snapshotRangeOn("y", 100L, 199L).agg(sum($"id")).head().getLong(0) ==
      grid(4096).filter($"y".between(100, 199)).agg(sum($"id")).head().getLong(0))
    // a Hilbert file is NOT a Morton-laid file: the incremental zorder
    // pass re-clusters it rather than mistaking the layout
    val es = t.entries(t.latestVersion.get)
    assert(es.forall(_.zTag.contains(GraftTable.hSignature(Seq("x", "y")))))
    assert(es.forall(e => !e.zTag.contains(GraftTable.zSignature(Seq("x", "y")))))
    // INCREMENTAL Hilbert: a scattered burst re-clusters into the same
    // grid, laid files carried verbatim, content exact
    val laid = t.activeFiles(t.latestVersion.get).toSet
    t.append(grid(4096).filter($"id" < 256).withColumn("id", $"id" + 10000L)
      .coalesce(1))
    t.compactHilbertIncremental(Seq("x", "y"), targetFiles = 16)
    assert(t.history().last.op == "hilbert")
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert(laid.subsetOf(after), "laid Hilbert files must carry over verbatim")
    assert(t.snapshot().count() == 4096L + 256L)
    assert(t.snapshotRangeOn("x", 0L, 511L).count() ==
      512L + grid(4096).filter($"id" < 256 && $"x" <= 511).count())
  }

  test("index windows persist in the log and recover via load") {
    val root = graft.TempDirs.create("graft_zorder_load")
    val t = new GraftTable(spark, root, indexCols = Seq("x", "y"))
    t.append(grid(256))
    t.compactZOrder(("x", "y"), targetFiles = 4)
    val reloaded = GraftTable.load(spark, root)
    // recovered handle prunes and reads identically
    assert(reloaded.snapshotRangeOn("x", 0L, 63L).count() == 64L)
    assert(reloaded.filesForColumnRange("x", 0L, 63L).size <=
      reloaded.activeFiles(reloaded.latestVersion.get).size)
  }
}
