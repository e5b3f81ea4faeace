package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unified predicate-driven data skipping (snapshotWhere): conjuncts
  * checked against every manifest index (stats/partition/indexCols
  * windows, point blooms), strict bounds relaxed, unprovable conjuncts
  * ignored, correctness always exact. Plus the O(metadata) fastCount. */
class PredicateSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("conjunctive ranges prune on every indexed dimension at once") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predskip"),
      indexCols = Seq("x", "y"))
    val df = (0 until 4096).map { i =>
      (i.toLong, ((i * 131) % 4096).toLong, ((i * 191) % 4096).toLong)
    }.toDF("id", "x", "y")
    t.append(df.repartition(8))
    t.compactZOrder(("x", "y"), targetFiles = 16)
    val all = t.activeFiles(t.latestVersion.get).size
    val pred = $"x" >= 0L && $"x" <= 511L && $"y" >= 0L && $"y" <= 511L
    val hit = t.filesForPredicate(pred).size
    assert(hit < all / 2, s"2-D conjunctive range hit $hit of $all files")
    // the combined prune is at least as tight as either single dimension
    assert(hit <= t.filesForColumnRange("x", 0L, 511L).size)
    assert(hit <= t.filesForColumnRange("y", 0L, 511L).size)
    // exactness: same rows as the unpruned filter
    assert(t.snapshotWhere(pred).count() ==
      df.filter($"x" <= 511 && $"y" <= 511).count())
  }

  test("point predicates consult the bloom; unprovable conjuncts don't break reads") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predbloom"),
      bloomCol = Some("id"))
    (0 until 3).foreach { s =>
      t.append((0 until 900).collect {
        case i if i % 3 == s => (i.toLong, s"v$i")
      }.toDF("id", "name"))
    }
    val all = t.activeFiles(t.latestVersion.get).size
    val hit = t.filesForPredicate($"id" === 300L).size
    assert(hit < all, s"bloom point lookup hit $hit of $all files")
    val out = t.snapshotWhere($"id" === 300L && length($"name") > 1)
    assert(out.select($"name").as[String].collect().toSeq == Seq("v300"))
    // a predicate with no provable conjunct scans everything but stays exact
    assert(t.snapshotWhere(length($"name") === 2).count() == 10L) // v0..v9
  }

  test("IN lists, reversed literals and strict bounds prune conservatively") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predin"),
      statsCol = Some("k"))
    t.append((0L to 99L).map(k => (k, k * 2)).toDF("k", "v"))
    t.append((100L to 199L).map(k => (k, k * 2)).toDF("k", "v"))
    t.append((200L to 299L).map(k => (k, k * 2)).toDF("k", "v"))
    val all = t.activeFiles(t.latestVersion.get).size
    assert(t.filesForPredicate($"k".isin(5L, 7L)).size < all)
    assert(t.snapshotWhere($"k".isin(5L, 7L)).count() == 2L)
    assert(t.snapshotWhere(lit(150L) <= $"k" && $"k" < 160L).count() == 10L)
    assert(t.filesForPredicate(lit(150L) <= $"k" && $"k" < 160L).size < all)
  }

  test("OR predicates over one column union their bounds and still prune") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predor"),
      statsCol = Some("k"))
    // three disjoint key bands, one file each
    (0 to 2).foreach(b => t.append(
      (b * 1000 until b * 1000 + 1000).map(i => (i.toLong, s"v$i"))
        .toDF("k", "v").coalesce(1)))
    val all = t.activeFiles(t.latestVersion.get).size
    // point OR point: a two-point set, still skips the untouched band
    val hitPts = t.filesForPredicate($"k" === 5L || $"k" === 2100L).size
    assert(hitPts < all, s"OR-points hit $hitPts of $all files")
    assert(t.snapshotWhere($"k" === 5L || $"k" === 2100L).count() == 2L)
    // range OR range: covering window, middle band may stay but reads exact
    val hitRange = t.filesForPredicate(
      ($"k" >= 10L && $"k" <= 20L) || ($"k" >= 2010L && $"k" <= 2020L)).size
    assert(hitRange <= all)
    assert(t.snapshotWhere(
      ($"k" >= 10L && $"k" <= 20L) || ($"k" >= 2010L && $"k" <= 2020L))
      .count() == 22L)
    // an OR across DIFFERENT columns proves nothing — must not mis-skip
    assert(t.snapshotWhere($"k" === 5L || $"v" === "v2100").count() == 2L)
    // half-bounded OR: one side unbounded below — union drops that bound
    assert(t.snapshotWhere($"k" <= 3L || $"k" === 2999L).count() == 5L)
  }

  test("string windows prune range and point predicates on a clustered string column") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predstr"),
      indexCols = Seq("doc_id"))
    // content-hash-shaped ids, appended in disjoint lexicographic bands
    // (the post-clustering layout): each file's truncated window is narrow
    def docs(prefix: Char, n: Int) =
      (0 until n).map(i => (f"$prefix$i%06d-hash", i.toLong)).toDF("doc_id", "v")
    t.append(docs('a', 200))
    t.append(docs('m', 200))
    t.append(docs('z', 200))
    val all = t.activeFiles(t.latestVersion.get).size
    // point equality on a string key prunes through the sw: window
    val hit = t.filesForPredicate($"doc_id" === "m000042-hash").size
    assert(hit < all, s"string point hit $hit of $all files")
    assert(t.snapshotWhere($"doc_id" === "m000042-hash").count() == 1L)
    // string range predicates prune too
    val rangeHit = t.filesForPredicate($"doc_id" >= "z" && $"doc_id" <= "zz").size
    assert(rangeHit < all, s"string range hit $rangeHit of $all files")
    assert(t.snapshotWhere($"doc_id" >= "z" && $"doc_id" <= "zz").count() == 200L)
    // IN over strings
    assert(t.filesForPredicate($"doc_id".isin("a000001-hash", "a000002-hash")).size < all)
    assert(t.snapshotWhere(
      $"doc_id".isin("a000001-hash", "a000002-hash")).count() == 2L)
  }

  test("hashed blooms prune string point lookups scattered across files") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predstrbloom"),
      bloomCol = Some("doc_id"))
    // ids INTERLEAVE across commits: windows span everything, only the
    // xxhash64 bloom can prune — the needle-in-100TB doc_id lookup
    (0 until 3).foreach { s =>
      t.append((0 until 900).collect {
        case i if i % 3 == s => (f"doc-$i%05d", i.toLong)
      }.toDF("doc_id", "v"))
    }
    val all = t.activeFiles(t.latestVersion.get).size
    val hit = t.filesForPredicate($"doc_id" === "doc-00300").size
    assert(hit < all, s"string bloom point hit $hit of $all files")
    assert(t.snapshotPointStr("doc-00300").count() == 1L)
    assert(t.snapshotPointStr("doc-99999").count() == 0L)
    assert(t.snapshotWhere($"doc_id" === "doc-00300").count() == 1L)
  }

  test("int-typed bloom columns probe with the same hash they built with") {
    // regression: the build pre-hash must widen int-width columns to
    // LONG (catalyst's xxhash64 otherwise hashes them with hashInt while
    // the driver probe hashes a long) — a mismatch makes every probe
    // miss and snapshotPoint silently SKIP files holding the value
    val t = new GraftTable(spark, graft.TempDirs.create("graft_intbloom"),
      bloomCol = Some("k"))
    (0 until 3).foreach { s =>
      t.append((0 until 900).collect {
        case i if i % 3 == s => (i, s"v$i") // Int key column
      }.toDF("k", "v"))
    }
    assert(t.snapshotPoint(300L).count() == 1L,
      "a point lookup on an Int bloom column must find its row")
    assert(t.snapshotWhere($"k" === 301).count() == 1L)
    val all = t.activeFiles(t.latestVersion.get).size
    val hit = t.filesForPoint(300L).size
    assert(hit < all, s"int bloom point hit $hit of $all files — no pruning")
    // and ingest-time dedup trusts the same probe: re-appending existing
    // Int keys must not land duplicates
    t.appendUnique((295 to 305).map(i => (i, s"dup$i")).toDF("k", "v"), "k")
    assert(t.snapshot().groupBy($"k").count().filter($"count" > 1).count() == 0,
      "appendUnique landed duplicate Int keys — bloom probe missed")
  }

  test("bloom geometry is row-adaptive: a big file's bloom grows and still prunes") {
    import spark.implicits._
    val t = new GraftTable(spark, graft.TempDirs.create("graft_bigbloom"),
      bloomCol = Some("id"))
    // 200k distinct ids in ONE file: the legacy fixed 8192-bit bloom
    // would saturate (every probe hits); the adaptive build sizes
    // 200k * 8 bits -> the absent-point probe must actually skip
    t.append((0L until 200000L).map(i => (i, i % 7)).toDF("id", "v")
      .coalesce(1))
    // a second small file keeps the floor geometry (8192 bits)
    t.append(Seq((900000001L, 0L)).toDF("id", "v").coalesce(1))
    val es = t.entries(t.latestVersion.get)
    assert(es.size == 2)
    // absent key: the big file's bloom must prune it (saturated = can't)
    assert(t.filesForPoint(123456789L).isEmpty,
      "absent-point probe should skip every file — the big bloom saturated")
    // present keys still resolve exactly, from either geometry
    assert(t.snapshotPoint(123456L).as[(Long, Long)].collect().toSeq ==
      Seq((123456L, 123456L % 7)))
    assert(t.snapshotPoint(900000001L).count() == 1L)
    assert(t.filesForPoint(900000001L).size == 1,
      "present-point probe should open only the one matching file")
  }

  test("timestamp windows prune time-range and point predicates exactly") {
    // three day-clustered commits -> disjoint tw: windows per file set;
    // a time-range read then opens O(matching files). The windows carry
    // catalyst-internal micros, so pushed TIMESTAMP literals compare
    // directly — no seconds truncation, no zone arithmetic.
    val t = new GraftTable(spark, graft.TempDirs.create("graft_predts"),
      indexCols = Seq("ts"))
    def day(d: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:${i % 60}%02d.${i % 1000}%03d")
    (0 until 3).foreach { d =>
      t.append((0 until 500).map(i => (d * 500L + i, day(d, i)))
        .toDF("id", "ts").coalesce(1))
    }
    val all = t.activeFiles(t.latestVersion.get).size
    val lo = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-02 23:59:59")
    val pred = $"ts" >= lit(lo) && $"ts" <= lit(hi)
    assert(t.filesForPredicate(pred).size < all,
      s"time-range read should skip other days' files (all=$all)")
    assert(t.snapshotWhere(pred).count() == 500L)
    // point predicate (exact micros equality) prunes to one day's files
    val p = day(0, 42)
    assert(t.filesForPredicate($"ts" === lit(p)).size < all)
    assert(t.snapshotWhere($"ts" === lit(p)).count() == 1L)
    // unparseable shapes (cross-type compare) prove nothing, stay exact
    assert(t.snapshotWhere($"ts" >= lit("2024-01-02").cast("date")).count()
      == 1000L)
    // DATE windows prune too, in days units
    val td = new GraftTable(spark, graft.TempDirs.create("graft_preddate"),
      indexCols = Seq("d"))
    (0 until 3).foreach { m =>
      td.append((0 until 90).map(i =>
        (m * 90L + i, java.sql.Date.valueOf(f"2024-${m * 3 + i / 31 + 1}%02d-${i % 28 + 1}%02d")))
        .toDF("id", "d").coalesce(1))
    }
    val dAll = td.activeFiles(td.latestVersion.get).size
    val dPred = $"d" >= lit(java.sql.Date.valueOf("2024-01-01")) &&
      $"d" <= lit(java.sql.Date.valueOf("2024-02-28"))
    assert(td.filesForPredicate(dPred).size < dAll)
    assert(td.snapshotWhere(dPred).count() ==
      td.snapshot().filter(dPred).count())
  }

  test("fastCount resolves from manifest metadata and tracks mutations") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_fastcount"))
    t.append((1L to 500L).toDF("id"))
    t.append((501L to 700L).toDF("id"))
    assert(t.fastCount() == 700L)
    t.delete($"id" > 600L)
    assert(t.fastCount() == 600L)
    assert(t.fastCount(Some(2L)) == 700L) // per-version
    assert(t.fastCount() == t.snapshot().count())
  }
}
