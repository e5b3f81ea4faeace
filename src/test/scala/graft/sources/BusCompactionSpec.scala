package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Keyed log compaction (the compacted-topic contract): latest-per-key
  * retention over sealed segments, offset preservation with gaps,
  * tombstone cleaning, the untouched active segment, and the
  * crash-swap recovery in segment listing. */
class BusCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def rec(k: String, v: String, ts: Long): (Array[Byte], Array[Byte], Long) =
    (if (k == null) null else k.getBytes("UTF-8"),
     v.getBytes("UTF-8"), ts)

  private def readAll(root: String) =
    spark.read.format("graft-bus").option("path", root).load()
      .select($"offset", $"key".cast("string").as("k"),
        $"value".cast("string").as("v"), $"timestamp")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq

  test("compaction keeps the latest record per key at its original offset") {
    val root = graft.TempDirs.create("graft_bus_compact")
    BusLog.append(conf, root, 0, Seq(rec("a", "a1", 10L), rec("b", "b1", 11L)))   // off 0,1
    BusLog.append(conf, root, 0, Seq(rec("a", "a2", 12L), rec("c", "c1", 13L)))   // off 2,3
    BusLog.append(conf, root, 0, Seq(rec("b", "b2", 14L)))                        // off 4 (active)
    val out = BusLog.compactKeyed(conf, root, 0)
    assert(out.nonEmpty)
    // sealed segments (offsets 0..3) compacted: a1 superseded by a2;
    // b1 survives (b2 is in the ACTIVE segment, which never compacts)
    assert(readAll(root) == Seq(
      (1L, "b", "b1", 11L), (2L, "a", "a2", 12L), (3L, "c", "c1", 13L),
      (4L, "b", "b2", 14L)))
    // the log's offset range is unchanged: compaction never renumbers
    val fs = new Path(root).getFileSystem(conf)
    assert(BusLog.range(fs, new Path(root))(0) == (0L, 5L))
    // a post-compaction append continues from the same log end
    BusLog.append(conf, root, 0, Seq(rec("d", "d1", 15L)))
    assert(readAll(root).last == (5L, "d", "d1", 15L))
  }

  test("an empty-value tombstone cleans its key out entirely") {
    val root = graft.TempDirs.create("graft_bus_tomb")
    BusLog.append(conf, root, 0, Seq(rec("a", "a1", 1L), rec("b", "b1", 2L)))
    BusLog.append(conf, root, 0, Seq(rec("a", "", 3L)))   // tombstone for a
    BusLog.append(conf, root, 0, Seq(rec("z", "z1", 4L))) // active
    BusLog.compactKeyed(conf, root, 0)
    assert(readAll(root).map(r => (r._1, r._2, r._3)) ==
      Seq((1L, "b", "b1"), (3L, "z", "z1")))
  }

  test("null-key records survive compaction as-is") {
    val root = graft.TempDirs.create("graft_bus_nullk")
    BusLog.append(conf, root, 0, Seq(rec(null, "n1", 1L), rec("a", "a1", 2L)))
    BusLog.append(conf, root, 0, Seq(rec(null, "n2", 3L), rec("a", "a2", 4L)))
    BusLog.append(conf, root, 0, Seq(rec("x", "x1", 5L))) // active
    BusLog.compactKeyed(conf, root, 0)
    assert(readAll(root).map(r => (r._1, Option(r._2), r._3)) == Seq(
      (0L, None, "n1"), (2L, None, "n2"), (3L, Some("a"), "a2"),
      (4L, Some("x"), "x1")))
  }

  test("offset slices and timestamp resolution respect compacted gaps") {
    val root = graft.TempDirs.create("graft_bus_gaps")
    BusLog.append(conf, root, 0, (0 until 6).map(i => rec(s"k${i % 2}", s"v$i", 100L + i)))
    BusLog.append(conf, root, 0, Seq(rec("tail", "t", 200L)))   // active
    BusLog.compactKeyed(conf, root, 0)
    // survivors of the sealed segment: offsets 4 (k0,v4) and 5 (k1,v5)
    assert(readAll(root).map(_._1) == Seq(4L, 5L, 6L))
    // an explicit offset window over the gap returns only retained records
    val sliced = spark.read.format("graft-bus").option("path", root)
      .option("startingOffsets", """{"0":1}""")
      .option("endingOffsets", """{"0":5}""").load()
      .select($"offset").as[Long].collect().toSeq.sorted
    assert(sliced == Seq(4L))
    // time-indexed start resolves through explicit offsets, not positions
    val fs = new Path(root).getFileSystem(conf)
    assert(BusLog.offsetForTimestamp(fs, new Path(root + "/p0"), 105L) == 5L)
  }

  test("crash-swap recovery: a covered raw segment is superseded by the compacted one") {
    val root = graft.TempDirs.create("graft_bus_swap")
    BusLog.append(conf, root, 0, Seq(rec("a", "a1", 1L), rec("a", "a2", 2L)))
    BusLog.append(conf, root, 0, Seq(rec("b", "b1", 3L))) // active
    val fs = new Path(root).getFileSystem(conf)
    val pdir = new Path(root, "p0")
    val rawSegs = BusLog.segments(fs, pdir)
    BusLog.compactKeyed(conf, root, 0)
    // simulate the crash window: restore the victim ALONGSIDE the
    // compacted segment — listing must hide the superseded raw segment
    val victim = rawSegs.head.path.getName
    val out = fs.create(new Path(pdir, victim), true)
    try out.write("QQ==\tYTE=\t1\nQQ==\tYTI=\t2\n".getBytes("UTF-8"))
    finally out.close()
    val listed = BusLog.segments(fs, pdir)
    assert(listed.count(_.base == 0L) == 1, s"expected one live segment at base 0: $listed")
    assert(listed.find(_.base == 0L).get.gen > 0L)
    assert(readAll(root).map(r => (r._1, r._2, r._3)) ==
      Seq((1L, "a", "a2"), (2L, "b", "b1")))
  }

  test("consumerLag reports end-minus-committed per consumer and partition") {
    val root = graft.TempDirs.create("graft_bus_lag")
    BusLog.append(conf, root, 0, (0 until 10).map(i => rec(s"k$i", "v", i.toLong)))
    BusLog.append(conf, root, 1, (0 until 4).map(i => rec(s"k$i", "v", i.toLong)))
    BusLog.recordConsumer(conf, root, "c1", Map(0 -> 7L, 1 -> 4L))
    BusLog.recordConsumer(conf, root, "c2", Map(0 -> 10L)) // nothing for p1
    val lag = BusLog.consumerLag(conf, root)
    assert(lag("c1") == Map(0 -> 3L, 1 -> 0L))
    assert(lag("c2") == Map(0 -> 0L, 1 -> 4L))
  }

  test("compactKeyedAll sweeps every partition; single-segment partitions are left alone") {
    val root = graft.TempDirs.create("graft_bus_all")
    BusLog.append(conf, root, 0, Seq(rec("a", "a1", 1L)))
    BusLog.append(conf, root, 0, Seq(rec("a", "a2", 2L)))
    BusLog.append(conf, root, 0, Seq(rec("a", "a3", 3L))) // active
    BusLog.append(conf, root, 1, Seq(rec("x", "x1", 4L))) // single segment
    val res = BusLog.compactKeyedAll(conf, root)
    assert(res(0).nonEmpty && res(1).isEmpty)
    assert(readAll(root).map(r => (r._1, r._3)) == Seq((1L, "a2"), (2L, "a3"), (0L, "x1")).sortBy(_._1))
  }
}
