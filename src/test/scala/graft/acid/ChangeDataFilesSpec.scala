package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** WRITE-SIDE change-data files (the public Delta _change_data design):
  * DV DELETE/UPDATE commits persist their net row changes once under
  * `_log/changes/<uuid>`, referenced from the commit header (`cdc=`),
  * and the change feed serves them WITHOUT touching base data files —
  * falling back to the endpoint-netting compute for anything not
  * serveable (feature off, COW rewrites, vacuumed change dirs, schema
  * drift). The serve is an accelerator with an exactness contract: it
  * must hash-match the compute path on every range it accepts. */
class ChangeDataFilesSpec extends SparkSpec {
  import spark.implicits._

  private val Key = "spark.graft.acid.writeChangeData"

  /** v1 seed append, v2 DV UPDATE (with a no-op slice), v3 DV DELETE —
    * the DV-heavy history the served path exists for. */
  private def buildDvHistory(root: String): GraftTable = {
    val t = new GraftTable(spark, root, statsCol = Some("id"))
    t.append((1L to 100L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "v")
      .repartitionByRange(4, col("id")))                      // v1
    // ids 1-10 genuinely change; ids 11-15 get a NO-OP update (v stays):
    // the no-op rows must cancel in the netting, served or computed
    t.update(col("id") <= 15L,
      Map("v" -> when(col("id") <= 10L, col("v") + 1000.0)
        .otherwise(col("v"))))                                // v2
    t.delete(col("id") >= 90L)                                // v3
    t
  }

  /** The SEMANTIC change feed (snapshot difference) — the ground truth
    * both the served and compute paths must land on. */
  private def expectedFeed(t: GraftTable, fromV: Long, toV: Long): DataFrame = {
    val a = t.snapshot(Some(fromV))
    val b = t.snapshot(Some(toV))
    b.exceptAll(a).withColumn("_change", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("_change", lit("delete")))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("DV update/delete commits persist change files; the feed serves them with zero base-file opens") {
    spark.conf.set(Key, "true")
    val root = graft.TempDirs.create("graft_cdf_served")
    try {
      val t = buildDvHistory(root)
      // both DML commits reference a change dir from their headers
      assert(t.headerMeta(2L).contains("cdc"), "v2 must record change data")
      assert(t.headerMeta(3L).contains("cdc"), "v3 must record change data")
      // exactness: served == semantic diff, single- and multi-version
      for ((f, to) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))) {
        assert(sortedRows(t.changeFeed(f, to)) ==
          sortedRows(expectedFeed(t, f, to)),
          s"served feed ($f,$to] must hash-match the snapshot diff")
      }
      // the 100 TB property: the served feed's scan set is ONLY the
      // KB-scale change files — no base data file is opened
      val inputs = t.changeFeed(2L, 3L).inputFiles ++
        t.changeFeed(1L, 3L).inputFiles
      assert(inputs.nonEmpty && inputs.forall(_.contains("/_log/changes/")),
        s"served feed must read only change files, got:\n${inputs.mkString("\n")}")
      // the keyed classification rides the same serve
      val keyed = t.changeFeedKeyed(1L, 3L, Seq("id"))
      val ups = keyed.filter(col("_change") === "update_postimage")
        .select("id").as[Long].collect().toSet
      assert(ups == (1L to 10L).toSet,
        s"only the genuinely-changed ids classify as updates, got $ups")
      assert(keyed.filter(col("_change") === "delete")
        .select("id").as[Long].collect().toSet == (90L to 100L).toSet)
    } finally {
      spark.conf.unset(Key)
    }
  }

  test("the streaming CDC feed over a CDF table hash-matches the compute path") {
    val rootOn = graft.TempDirs.create("graft_cdf_stream_on")
    val rootOff = graft.TempDirs.create("graft_cdf_stream_off")
    spark.conf.set(Key, "true")
    val on = try buildDvHistory(rootOn) finally spark.conf.unset(Key)
    val off = buildDvHistory(rootOff)
    assert(on.headerMeta(2L).contains("cdc") && !off.headerMeta(2L).contains("cdc"))
    def drain(t: GraftTable): Seq[String] = {
      val ckpt = graft.TempDirs.create("graft_cdf_stream_ckpt")
      val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
      val q = spark.readStream.format("graft-table").option("path", t.root)
        .option("readChangeFeed", "true").option("changeFeedKeys", "id")
        .option("maxVersionsPerBatch", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().map(_.toString).foreach(seen.add); () }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.sorted
    }
    assert(drain(on) == drain(off),
      "served and computed CDC streams must deliver identical rows")
  }

  test("a reclaimed change dir degrades to the netting compute, never breaks the feed") {
    spark.conf.set(Key, "true")
    val root = graft.TempDirs.create("graft_cdf_fallback")
    try {
      val t = buildDvHistory(root)
      val uuid = t.headerMeta(2L)("cdc")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(t.changeDirPath(uuid), true)
      val cold = GraftTable.load(spark, root)
      assert(sortedRows(cold.changeFeed(1L, 3L)) ==
        sortedRows(expectedFeed(cold, 1L, 3L)),
        "missing change dir must fall back to the compute path")
    } finally spark.conf.unset(Key)
  }

  test("vacuum keeps referenced change dirs, reclaims dropped ones, age-gates orphans") {
    spark.conf.set(Key, "true")
    val root = graft.TempDirs.create("graft_cdf_vacuum")
    try {
      val t = buildDvHistory(root)
      t.delete(col("id") === 50L) // v4: one more change-file commit
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val chDir = new org.apache.hadoop.fs.Path(s"$root/_log/changes")
      val uuidV2 = t.headerMeta(2L)("cdc")
      val uuidV4 = t.headerMeta(4L)("cdc")
      // two orphans (no commit references them): one fresh, one old
      val fresh = new org.apache.hadoop.fs.Path(chDir, "orphanfresh")
      val old = new org.apache.hadoop.fs.Path(chDir, "orphanold")
      fs.mkdirs(fresh); fs.mkdirs(old)
      fs.setTimes(old, System.currentTimeMillis() - 3600L * 1000L, -1)
      t.vacuum(retain = 2) // keeps v3, v4 — drops v1, v2
      val left = fs.listStatus(chDir).map(_.getPath.getName).toSet
      assert(!left.contains(uuidV2), "a dropped version's change dir is dead")
      assert(left.contains(uuidV4), "a retained version's change dir survives")
      assert(left.contains("orphanfresh"),
        "a YOUNG orphan may belong to an in-flight writer — kept")
      assert(!left.contains("orphanold"), "an aged orphan is reclaimed")
      // the retained range still serves
      val cold = GraftTable.load(spark, root)
      assert(sortedRows(cold.changeFeed(3L, 4L)) ==
        sortedRows(expectedFeed(cold, 3L, 4L)))
    } finally spark.conf.unset(Key)
  }

  test("a range with a vacuumed prefix is refused by the serve (fromV=0 over dropped v1)") {
    spark.conf.set(Key, "true")
    val root = graft.TempDirs.create("graft_cdf_prefix")
    try {
      val t = buildDvHistory(root)
      t.vacuum(retain = 2) // v1 and v2 manifests are gone
      val cold = GraftTable.load(spark, root)
      // (0, 3] can no longer be served version-by-version (v1's changes
      // are unrecoverable from the log) — the serve must refuse; the
      // caller's compute path resolves endpoints through the checkpoint
      assert(cold.changeFeedServedSides(0L, 3L,
        cold.snapshot().schema).isEmpty,
        "a gap in the version range must refuse the serve")
    } finally spark.conf.unset(Key)
  }
}
