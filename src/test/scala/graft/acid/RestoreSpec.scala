package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RESTORE: metadata-only rollback re-referencing an old version's files. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, off: Int = 0) =
    (1 to n).map(i => (i.toLong + off, s"u${i + off}")).toDF("id", "name")

  test("restore re-references the target version's files without data I/O") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_restore"))
    t.append(rows(3))            // v1
    t.append(rows(2, 10))        // v2
    t.overwrite(rows(1, 99))     // v3 (the "bad" commit)
    val v2Files = t.activeFiles(2L).toSet
    val rv = t.restore(2L)
    assert(rv == 4L)
    assert(t.activeFiles(4L).toSet == v2Files, "restore must re-reference, not rewrite")
    assert(t.snapshot().select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 11L, 12L))
    // the bad commit stays time-travelable until vacuumed
    assert(t.snapshot(Some(3L)).count() == 1L)
    assert(t.history().last.op == "restore")
    intercept[IllegalArgumentException] { t.restore(99L) }
  }

  test("restore brings back the target version's declared schema") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_restore_schema"))
    t.append(rows(2), mergeSchema = true)   // v1: schema tracking on
    t.addColumn("score", DoubleType)        // v2
    t.append(Seq((50L, "x", 1.5)).toDF("id", "name", "score")) // v3
    t.restore(1L)                           // v4: back to the 2-column world
    assert(t.snapshot().columns.toSeq == Seq("id", "name"))
    assert(t.tableSchema.map(_.fieldNames.toSeq).contains(Seq("id", "name")))
    // restoring forward again recovers the evolved state
    t.restore(3L)
    assert(t.snapshot().columns.toSeq == Seq("id", "name", "score"))
    assert(t.snapshot().count() == 3L)
  }

  test("historyDF surfaces version, op, timestamp and recorded row counts") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_histdf"))
    t.append(rows(3))
    t.overwrite(rows(5, 10))
    t.restore(1L)
    val h = t.historyDF.orderBy($"version")
      .select($"version", $"operation", $"n_rows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2)))
    assert(h.toSeq == Seq((1L, "append", 3L), (2L, "overwrite", 5L),
      (3L, "restore", 3L)))
    assert(t.historyDF.filter($"commit_ts".isNull).count() == 0)
  }

  test("restoreAt resolves by commit timestamp") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_restore_ts"))
    t.append(rows(1))
    val cut = t.history().last.commitMs
    Thread.sleep(5)
    t.append(rows(1, 50))
    t.restoreAt(cut)
    assert(t.snapshot().count() == 1L)
  }
}
