package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** CONVERT TO graft: in-place adoption of an existing parquet directory
  * — zero rewrite, full index profiling, and every table capability
  * (skipping, DVs, appends, time travel, vacuum safety) working on the
  * adopted files. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("convert adopts a parquet directory without rewriting a byte") {
    val root = graft.TempDirs.create("graft_convert")
    (1L to 1000L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v")
      .repartitionByRange(4, $"id")
      .write.mode("overwrite").parquet(root)
    val f = fs(root)
    val before = f.listStatus(new Path(root)).map(s =>
      s.getPath.getName -> s.getModificationTime).toMap
    val t = GraftTable.convert(spark, root, statsCol = Some("id"),
      bloomCol = Some("id"))
    // no data byte moved: same files, same mtimes
    val after = f.listStatus(new Path(root))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    assert(after.forall { case (n, m) => before.get(n).contains(m) },
      "convert must not rewrite or touch the adopted files")
    assert(t.history().map(_.op) == Seq("convert"))
    assert(t.snapshot().count() == 1000L)
    assert(t.fastCount() == 1000L, "row counts profiled at conversion")
    // the profiling pass recorded real windows + blooms: pruned reads work
    val all = t.activeFiles(1L).size
    assert(all == 4)
    assert(t.filesForRange(1L, 100L, Some(1L)).size < all,
      "stats windows must prune adopted files")
    assert(t.snapshotRange(1L, 100L).count() == 100L)
    assert(t.filesForPoint(500L).size < all, "blooms profiled at conversion")
    assert(t.snapshotPoint(500L).count() == 1L)
  }

  test("a converted table mutates like a native one — DVs on adopted files included") {
    val root = graft.TempDirs.create("graft_convert_mut")
    (1L to 200L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(2).write.mode("overwrite").parquet(root)
    val t = GraftTable.convert(spark, root, statsCol = Some("id"))
    // DV delete masks rows INSIDE an adopted (root-level) file: the mask
    // key must match the parquet _metadata path for these files too
    t.delete($"id" === 42L)
    assert(t.entries(t.latestVersion.get).exists(_.dvRef.isDefined),
      "small delete on a converted table must take the DV path")
    assert(t.snapshot().count() == 199L)
    assert(t.snapshot().filter($"id" === 42L).count() == 0L)
    // native appends coexist with adopted files
    t.append(Seq((1000L, "x")).toDF("id", "name"))
    assert(t.snapshot().count() == 200L)
    // time travel back to the conversion
    assert(t.snapshot(Some(1L)).count() == 200L)
    assert(t.snapshot(Some(1L)).filter($"id" === 42L).count() == 1L)
    // vacuum never touches adopted files (only native data/)
    t.compact(targetFiles = 1)
    t.vacuum(1)
    assert(t.snapshot().count() == 200L)
    val adopted = fs(root).listStatus(new Path(root))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(adopted == 2, "vacuum must leave adopted files on disk")
    // and a fresh handle recovers everything from the log
    assert(GraftTable.load(spark, root).snapshot().count() == 200L)
  }

  test("convert rejects hive partition layouts, duplicates, and re-conversion") {
    val root = graft.TempDirs.create("graft_convert_bad")
    (1L to 10L).map(i => (i, i % 2)).toDF("id", "day")
      .write.partitionBy("day").mode("overwrite").parquet(root)
    val err = intercept[IllegalArgumentException](
      GraftTable.convert(spark, root))
    assert(err.getMessage.contains("partition directory"))
    val root2 = graft.TempDirs.create("graft_convert_ok")
    (1L to 10L).toDF("id").coalesce(1).write.mode("overwrite").parquet(root2)
    GraftTable.convert(spark, root2)
    assert(intercept[IllegalArgumentException](
      GraftTable.convert(spark, root2)).getMessage.contains("already"))
  }
}
