package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ROW TRACKING (the Delta row-ID pattern, stored form): a rowTracking
  * table's appends mint a table-unique `_row_id` per row from a
  * commit-carried watermark; rewrites (compact / zorder / reorg / DV
  * update's post-image) carry the stored column verbatim. The payoff:
  * KEYLESS CDC update classification — changeFeedKeyed over "_row_id"
  * pairs pre/post images with no user-declared key — and stable
  * provenance joins across layout churn. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  test("appends mint unique ids; the watermark advances across commits and handles") {
    val root = graft.TempDirs.create("graft_rt")
    val t = new GraftTable(spark, root, rowTracking = true)
    t.append((1L to 100L).map(i => (i, s"a$i")).toDF("k", "s"))
    t.append((101L to 200L).map(i => (i, s"b$i")).toDF("k", "s"))
    // a LOADED handle recovers the flag and keeps minting above the mark
    val t2 = GraftTable.load(spark, root)
    assert(t2.rowTracking, "load() must recover the rt flag")
    t2.append((201L to 300L).map(i => (i, s"c$i")).toDF("k", "s"))
    val ids = t2.snapshot().select("_row_id").as[Long].collect()
    assert(ids.length == 300 && ids.distinct.length == 300,
      "every row must carry a table-unique _row_id")
  }

  test("compact and zorder preserve the id set exactly") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_rt_layout"),
      statsCol = Some("k"), rowTracking = true)
    t.append((1L to 500L).map(i => (i, i % 7)).toDF("k", "g"))
    val before = t.snapshot().select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap
    t.compact(targetFiles = 2)
    t.compactZOrderN(Seq("k", "g"), targetFiles = 2)
    val after = t.snapshot().select($"k", $"_row_id").as[(Long, Long)]
      .collect().toMap
    assert(after == before,
      "layout rewrites must carry every row's _row_id verbatim")
  }

  test("a DV update preserves ids: keyless update classification via changeFeedKeyed(_row_id)") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_rt_cdc"),
      statsCol = Some("k"), rowTracking = true)
    t.append((1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))  // v1
    t.update(col("k") <= 10L, Map("v" -> (col("v") + 100.0)))     // v2: DV
    val feed = t.changeFeedKeyed(1L, 2L, Seq("_row_id"))
    val pre = feed.filter($"_change" === "update_preimage")
      .select($"k").as[Long].collect().toSet
    val post = feed.filter($"_change" === "update_postimage")
      .select($"k").as[Long].collect().toSet
    assert(pre == (1L to 10L).toSet && post == pre,
      "pre/post images must pair by _row_id with NO user key declared")
    assert(feed.filter($"_change".isin("insert", "delete")).isEmpty,
      "an update must never classify as unpaired insert/delete")
    // the updated rows kept their ids (provenance survives the update)
    val idsBefore = t.snapshot(Some(1L)).filter($"k" <= 10L)
      .select($"_row_id").as[Long].collect().toSet
    val idsAfter = t.snapshot().filter($"k" <= 10L)
      .select($"_row_id").as[Long].collect().toSet
    assert(idsAfter == idsBefore)
  }

  test("partitioned table: ids stay unique when the source is wider than its partition values") {
    // the regression shape: clusterByPartition inserts a repartitionByRange
    // ABOVE the id projection, so the ids evaluate with the SOURCE's
    // partition count (16 here) while an unpinned span would use the
    // post-shuffle count (2 distinct values) — under-advancing the
    // watermark and re-minting live ids on the next append
    val t = new GraftTable(spark, graft.TempDirs.create("graft_rt_part"),
      partitionCol = Some("p"), rowTracking = true)
    def batch(off: Long) = spark.range(off, off + 1000L, 1L, 16)
      .select(col("id").as("k"), (col("id") % 2).as("p"))
    t.append(batch(0L))
    t.append(batch(1000L))
    val ids = t.snapshot().select("_row_id").as[Long].collect()
    assert(ids.length == 2000 && ids.distinct.length == 2000,
      s"partitioned appends re-minted ${ids.length - ids.distinct.length} live ids")
    // and the keyless CDC pairing row tracking exists for still works
    t.update(col("k") === 7L, Map("p" -> lit(9L)))
    val feed = t.changeFeedKeyed(2L, 3L, Seq("_row_id"))
    assert(feed.filter(col("_change").isin("insert", "delete")).isEmpty,
      "duplicate ids would break pre/post pairing into insert/delete noise")
  }

  test("racing id-assigning appends never mint overlapping ids") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_rt_race"),
      rowTracking = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (0 until 2).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (0 until 5).foreach { i =>
            t.commitWithRetry() {
              t.append(Seq((w * 100L + i, s"w$w-$i")).toDF("k", "s"))
            }
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val ids = t.snapshot().select("_row_id").as[Long].collect()
    assert(ids.length == 10 && ids.distinct.length == 10,
      s"racing appends must never reuse a watermark: $ids")
  }
}
