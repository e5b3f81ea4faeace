package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** [[GraftTable.vacuum]]'s DISTRIBUTED data-file sweep (executor-side
  * listing → shuffle anti-join against the live set → fanned-out
  * deletes, gated by `spark.graft.acid.distributedVacuumMinFiles`):
  * must remove exactly what the serial driver loop removes — nothing
  * live deleted, nothing dead left — and leave the retained version
  * readable. */
class VacuumSweepSpec extends SparkSpec {
  import spark.implicits._

  /** Two appends, a COW delete (orphans the rewritten files' ancestors),
    * a compaction (supersedes everything) — a history whose vacuum(1)
    * has plenty of dead files across several commit dirs. */
  private def build(root: String): GraftTable = {
    val t = new GraftTable(spark, root, statsCol = Some("id"))
    t.append((1L to 40L).map(i => (i, i * 1.0)).toDF("id", "v"))
    t.append((41L to 80L).map(i => (i, i * 1.0)).toDF("id", "v"))
    t.delete($"id" % 10L === 0L, useDv = false)
    t.compact(targetFiles = 2)
    t
  }

  private def diskDataFiles(t: GraftTable): Set[String] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dataDir = new Path(t.root, "data")
    if (!fs.exists(dataDir)) Set.empty
    else fs.listStatus(dataDir).flatMap(d => fs.listStatus(d.getPath)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(f => s"data/${d.getPath.getName}/${f.getPath.getName}")).toSet
  }

  test("distributed sweep = driver sweep: exact dead set gone, live set intact") {
    val a = build(graft.TempDirs.create("graft_vac_drv")) // driver path
    val b = build(graft.TempDirs.create("graft_vac_dst")) // distributed path
    val deadA = diskDataFiles(a) -- a.entries(a.versions.last).map(_.path).toSet
    val removedA = a.vacuum(1)
    val removedB =
      try {
        spark.conf.set("spark.graft.acid.distributedVacuumMinFiles", "1")
        b.vacuum(1)
      } finally spark.conf.unset("spark.graft.acid.distributedVacuumMinFiles")
    // identical histories -> identical sweep size; and the driver path's
    // removed set is exactly its pre-vacuum dead set
    assert(removedA.toSet == deadA)
    assert(removedB.size == removedA.size,
      s"distributed sweep removed ${removedB.size}, driver ${removedA.size}")
    // the 100 TB invariant on BOTH paths: disk data files == live entry
    // paths, exactly (nothing live deleted, nothing dead left behind)
    for (t <- Seq(a, b))
      assert(diskDataFiles(t) == t.entries(t.versions.last).map(_.path).toSet)
    // the retained version still reads in full
    val expect = (1L to 80L).filter(_ % 10L != 0L).map(i => (i, i * 1.0)).toSet
    assert(b.snapshot().as[(Long, Double)].collect().toSet == expect)
    assert(a.snapshot().as[(Long, Double)].collect().toSet == expect)
  }
}
