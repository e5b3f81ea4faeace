package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** IN-COMMIT MONOTONE TIMESTAMPS (the public Delta ICT design): every
  * commit's `ts=` clamps to parent + 1, so timestamp time travel
  * ([[GraftTable.snapshotAt]]) and time-based retention
  * ([[GraftTable.vacuumOlderThan]]) stay consistent under writer clock
  * skew and sub-millisecond commit bursts. */
class CommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  test("commit timestamps strictly increase even within one millisecond") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_ict_fast"))
    (1 to 5).foreach(i => t.append(Seq((i.toLong, i)).toDF("id", "x")))
    val ts = t.history().map(_.commitMs)
    assert(ts == ts.sorted && ts.distinct.size == ts.size,
      s"commit times must strictly increase, got $ts")
  }

  test("a clock-skewed parent commit clamps the child forward") {
    val root = graft.TempDirs.create("graft_ict_skew")
    val t = new GraftTable(spark, root)
    t.append(Seq((1L, 1)).toDF("id", "x"))
    // simulate a writer whose clock ran an hour AHEAD: inflate v1's ts
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val m = new Path(s"$root/_log/" + f"v${1L}%020d.manifest")
    val lines = scala.io.Source.fromInputStream(fs.open(m), "UTF-8")
      .getLines().toVector
    val future = System.currentTimeMillis() + 3600L * 1000L
    val head = lines.head.replaceAll("ts=\\d+", s"ts=$future")
    val out = fs.create(m, true)
    out.write((head +: lines.tail).mkString("\n").getBytes(UTF_8))
    out.close()
    // a FRESH handle commits v2: its ts must clamp to parent + 1, not
    // jump back to the true wall clock (which would invert the order
    // and let snapshotAt resolve a state "before its parent committed")
    val t2 = GraftTable.load(spark, root)
    t2.append(Seq((2L, 2)).toDF("id", "x"))
    val h = t2.history()
    assert(h.map(_.commitMs) == h.map(_.commitMs).sorted)
    assert(h.last.commitMs == future + 1L,
      s"child must clamp to skewed parent + 1, got ${h.last.commitMs} vs $future")
    // timestamp time travel stays consistent across the skew
    assert(t2.snapshotAt(future).count() == 1L)
    assert(t2.snapshotAt(future + 1L).count() == 2L)
  }
}
