package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE ([[GraftTable.applyChangesAgg]]):
  * an aggregate mirror (group -> live count + exact DECIMAL sums) folds
  * a netted change feed in as ±deltas, batch by batch, and must equal
  * the full recompute over the source's current state at every point —
  * the materialized-view identity. DECIMAL sums make the equality
  * EXACT (order-insensitive), not approximate. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  /** Full recompute the mirror must match: group -> (count, sum). */
  private def expected(src: DataFrame): Map[String, (Long, BigDecimal)] =
    src.groupBy($"g").agg(count(lit(1)).as("n"),
      sum($"v".cast("decimal(28,6)")).cast("decimal(28,6)").as("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  private def mirrorState(m: GraftTable): Map[String, (Long, BigDecimal)] =
    m.snapshot().collect().map(r => r.getString(0) ->
      ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  private def feedOf(rows: Seq[(String, Double, String)]): DataFrame =
    rows.toDF("g", "v", "_change")

  test("multi-batch folds equal the full recompute; dead groups leave; cross-group updates move") {
    val m = new GraftTable(spark, graft.TempDirs.create("graft_iagg"))
    // batch 1: bootstrap (pure inserts)
    m.applyChangesAgg(feedOf(Seq(
      ("a", 1.5, "insert"), ("a", 2.5, "insert"), ("b", 10.0, "insert"))),
      "g", Seq("v"))
    var src = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0)).toDF("g", "v")
    assert(mirrorState(m) == expected(src))
    // batch 2: in-group update (n net 0, sum moves) + cross-group move +
    // a fresh group
    m.applyChangesAgg(feedOf(Seq(
      ("a", 1.5, "update_preimage"), ("a", 100.5, "update_postimage"),
      ("b", 10.0, "update_preimage"), ("c", 10.0, "update_postimage"),
      ("d", 7.25, "insert"))),
      "g", Seq("v"))
    src = Seq(("a", 100.5), ("a", 2.5), ("c", 10.0), ("d", 7.25)).toDF("g", "v")
    assert(mirrorState(m) == expected(src))
    assert(!mirrorState(m).contains("b"),
      "a group whose live count reaches 0 must leave the mirror")
    // batch 3: delete the last row of d, add more to c
    m.applyChangesAgg(feedOf(Seq(
      ("d", 7.25, "delete"), ("c", 0.5, "insert"))),
      "g", Seq("v"))
    src = Seq(("a", 100.5), ("a", 2.5), ("c", 10.0), ("c", 0.5)).toDF("g", "v")
    assert(mirrorState(m) == expected(src))
  }

  test("a replayed batch with the same txn epoch is a no-op (exactly-once under retry)") {
    val m = new GraftTable(spark, graft.TempDirs.create("graft_iagg_txn"))
    val b1 = feedOf(Seq(("a", 1.5, "insert"), ("b", 10.0, "insert")))
    m.applyChangesAgg(b1, "g", Seq("v"), txn = Some(("w", 0L)))
    val after1 = mirrorState(m)
    // the foreachBatch-retry shape: the SAME epoch re-applies — must not
    // double the mirror
    m.applyChangesAgg(b1, "g", Seq("v"), txn = Some(("w", 0L)))
    assert(mirrorState(m) == after1, "a replayed epoch must be a no-op")
    // a LATER epoch applies normally
    m.applyChangesAgg(feedOf(Seq(("a", 2.0, "insert"))), "g", Seq("v"),
      txn = Some(("w", 1L)))
    assert(mirrorState(m) ==
      expected(Seq(("a", 1.5), ("a", 2.0), ("b", 10.0)).toDF("g", "v")))
    // replaying epoch 1 after it landed: still a no-op
    m.applyChangesAgg(feedOf(Seq(("a", 2.0, "insert"))), "g", Seq("v"),
      txn = Some(("w", 1L)))
    assert(mirrorState(m) ==
      expected(Seq(("a", 1.5), ("a", 2.0), ("b", 10.0)).toDF("g", "v")))
  }

  test("null group keys fold null-safely: deltas land on the existing null-key row") {
    val m = new GraftTable(spark, graft.TempDirs.create("graft_iagg_null"))
    m.applyChangesAgg(Seq((Option("a"), 1.0, "insert"),
      (Option.empty[String], 5.0, "insert")).toDF("g", "v", "_change"),
      "g", Seq("v"))
    // an ALL-null-key batch must still apply (na.drop would no-op it)
    m.applyChangesAgg(Seq((Option.empty[String], 2.5, "insert"))
      .toDF("g", "v", "_change"), "g", Seq("v"))
    val rows = m.snapshot().collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet
    assert(rows == Set((Some("a"), 1L, BigDecimal("1.000000")),
      (None, 2L, BigDecimal("7.500000"))),
      s"null-key group must merge into ONE row, got $rows")
    // deleting one null-key row nets it down, not out
    m.applyChangesAgg(Seq((Option.empty[String], 5.0, "delete"))
      .toDF("g", "v", "_change"), "g", Seq("v"))
    val after = m.snapshot().filter($"g".isNull).collect()
    assert(after.length == 1 && after.head.getLong(1) == 1L)
  }

  test("the end-to-end CDC loop: keyed stream -> aggregate mirror equals the source's aggregate") {
    val srcRoot = graft.TempDirs.create("graft_iagg_src")
    val t = new GraftTable(spark, srcRoot, statsCol = Some("id"))
    t.append((1L to 60L).map(i => (i, s"t${i % 4}", i * 1.0))
      .toDF("id", "g", "v").repartitionByRange(4, col("id")))      // v1
    t.update(col("id") <= 10L, Map("v" -> (col("v") + 100.0)))     // v2
    t.delete(col("id") > 50L)                                      // v3
    val mir = new GraftTable(spark, graft.TempDirs.create("graft_iagg_mir"))
    val ckpt = graft.TempDirs.create("graft_iagg_ckpt")
    val q = spark.readStream.format("graft-table").option("path", srcRoot)
      .option("readChangeFeed", "true").option("changeFeedKeys", "id")
      .option("maxVersionsPerBatch", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          mir.applyChangesAgg(b.drop("_commit_version"), "g", Seq("v"))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val want = t.snapshot().groupBy($"g")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(28,6)")).cast("decimal(28,6)").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet
    val got = mir.snapshot().collect().map(r => (r.getString(0),
      r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
    assert(got == want, s"mirror $got must equal recompute $want")
  }
}
