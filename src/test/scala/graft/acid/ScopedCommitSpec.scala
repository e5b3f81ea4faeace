package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** The DELTA-FIRST commit path ([[GraftTable.commitDelta]]) — the 100 TB
  * ingest contract: an append on a sharded-checkpoint table touches
  * O(batch) driver state — NO full entry-list materialization, NO
  * resident `Seq[FileEntry]` for the new version — and its periodic
  * checkpoint rewrites only the shards the batch touched, reconstructed
  * from the prior checkpoint plus a delta-chain replay. Manifest bytes
  * must be indistinguishable from the classic path's, so every reader
  * (cold resolution, time travel, fuzz) works unchanged. */
class ScopedCommitSpec extends SparkSpec {
  import spark.implicits._

  private val MinFilesKey = "spark.graft.acid.parquetCheckpointMinFiles"
  private val ShardsKey = "spark.graft.acid.checkpointShards"

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def withSidecars[A](k: Int)(body: => A): A = {
    spark.conf.set(MinFilesKey, "1")
    spark.conf.set(ShardsKey, k.toString)
    try body finally { spark.conf.unset(MinFilesKey); spark.conf.unset(ShardsKey) }
  }

  private def shardRefs(root: String, v: Long): Map[Int, String] =
    scala.io.Source.fromInputStream(fs.open(new Path(
      s"$root/_log/v${"%020d".format(v)}.pcp"))).getLines().toList
      .filter(_.startsWith("s\t")).map { l =>
        val a = l.split('\t'); a(1).toInt -> a(2)
      }.toMap

  test("an ingest commit resolves and rewrites O(touched), not O(table): no full-list materialization") {
    withSidecars(8) {
      val root = graft.TempDirs.create("graft_scoped_ingest")
      val t = new GraftTable(spark, root, checkpointInterval = 1)
      // seed: one append establishes the sidecar checkpoint base
      t.append((1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartition(8))
      val resolutionsAfterSeed = t.fullResolutions.get()
      val residentAfterSeed = t.residentEntryVersions
      // steady-state ingest: each append must neither walk the full
      // chain nor pin a new resident entry list — the delta-first
      // contract (the seed's own resolution count is the baseline)
      (2L to 5L).foreach { i =>
        t.append(Seq((1000L + i, i * 1.0)).toDF("k", "v"))
      }
      assert(t.fullResolutions.get() == resolutionsAfterSeed,
        s"ingest commits must not materialize the full entry list " +
          s"(resolutions ${resolutionsAfterSeed} -> ${t.fullResolutions.get()})")
      assert(t.residentEntryVersions == residentAfterSeed,
        s"ingest commits must not pin new resident entry lists: " +
          s"${t.residentEntryVersions -- residentAfterSeed}")
      // ...and yet every version checkpointed (interval=1) and the cold
      // read resolves the exact accumulated content
      val cold = new GraftTable(spark, root, checkpointInterval = 1)
      val ks = cold.snapshot().select("k").as[Long].collect().toSet
      assert(ks == ((1L to 200L) ++ (1002L to 1005L)).toSet)
    }
  }

  test("the scoped checkpoint rewrites only the touched shards; untouched refs carry verbatim") {
    withSidecars(8) {
      val root = graft.TempDirs.create("graft_scoped_shards")
      val t = new GraftTable(spark, root, checkpointInterval = 1)
      t.append((1L to 300L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartition(8))                                          // v1: base
      val refs1 = shardRefs(root, 1L)
      t.append(Seq((9001L, 1.0)).toDF("k", "v").coalesce(1))      // v2: 1 file
      val refs2 = shardRefs(root, 2L)
      // exactly the new file's shard(s) rewrote; every other ref is the
      // SAME relpath (dir reuse, not content equality)
      val changed = refs2.filter { case (s, rel) => !refs1.get(s).contains(rel) }
      assert(changed.nonEmpty && changed.size <= 1,
        s"a 1-file append must dirty at most 1 shard, rewrote: $changed")
      assert((refs1.keySet -- changed.keySet).forall(s =>
        refs2.get(s) == refs1.get(s)),
        "untouched shards must re-reference the prior checkpoint's dirs")
      // chain replay across SEVERAL delta commits between checkpoints:
      // v3..v5 are checkpoint-less deltas, v6 is due (6 % 3 == 0) and
      // its scoped write must replay the whole chain above v2's base
      val t2 = new GraftTable(spark, root, checkpointInterval = 3)
      (2L to 5L).foreach(i =>
        t2.append(Seq((9000L + i, 1.0)).toDF("k", "v").coalesce(1))) // v3-v6
      assert(fs.exists(new Path(s"$root/_log/v${"%020d".format(6)}.pcp")),
        "the interval checkpoint must land on the delta path")
      val cold = new GraftTable(spark, root)
      assert(cold.snapshot().count() == 305L)
      // and the checkpoint itself serves resolution (trim the chain)
      (1L to 5L).foreach { v =>
        assert(fs.delete(
          new Path(s"$root/_log/v${"%020d".format(v)}.manifest"), false),
          s"fixture: manifest v$v must exist to be trimmed")
      }
      val cold2 = new GraftTable(spark, root)
      assert(cold2.snapshot().count() == 305L,
        "post-vacuum-shape resolution must come entirely from the scoped checkpoint")
    }
  }

  test("applyChangesKeyed folds delta-first: O(touched) resolution via the distributed prune") {
    withSidecars(4) {
      spark.conf.set("spark.graft.acid.distributedPruneMinFiles", "1")
      try {
        val root = graft.TempDirs.create("graft_scoped_apply")
        val t0 = new GraftTable(spark, root, statsCol = Some("id"),
          checkpointInterval = 1)
        t0.append((1L to 400L).map(i => (i, i * 1.0)).toDF("id", "v")
          .repartitionByRange(8, col("id")))                      // v1 + ckpt
        // a COLD handle: nothing resident, nothing cached
        val t = GraftTable.load(spark, root)
        val r0 = t.fullResolutions.get()
        val res0 = t.residentEntryVersions
        t.applyChangesKeyed(Seq((5L, 999.0, "update_postimage"))
          .toDF("id", "v", "_change"), "id")                      // v2
        assert(t.fullResolutions.get() == r0,
          "the keyed fold must resolve only its touched-key candidates " +
            "(distributed prune), never the full entry list")
        assert(t.residentEntryVersions == res0,
          s"no new resident entry lists: ${t.residentEntryVersions -- res0}")
        // content is exactly the fold's result
        val cold = GraftTable.load(spark, root)
        assert(cold.snapshot().filter(col("id") === 5L)
          .select("v").as[Double].head() == 999.0)
        assert(cold.snapshot().count() == 400L)
      } finally
        spark.conf.unset("spark.graft.acid.distributedPruneMinFiles")
    }
  }

  test("delta-path manifests are byte-compatible: time travel, schema carry, nf/nr arithmetic") {
    withSidecars(4) {
      val root = graft.TempDirs.create("graft_scoped_compat")
      val t = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 2)
      t.append((1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"),
        mergeSchema = true)                                       // v1
      t.append((51L to 80L).map(i => (i, i * 1.0)).toDF("k", "v")) // v2
      // header arithmetic: nf and nr must state the true totals
      val meta2 = t.headerMeta(2L)
      assert(meta2.get("nf").exists(_.toLong == t.entries(2L).size.toLong))
      assert(meta2.get("nr").exists(_.toLong == 80L),
        s"nr must carry by arithmetic: ${meta2.get("nr")}")
      // a DV delete (classic commit path) composes on top
      t.delete(org.apache.spark.sql.functions.col("k") <= 10L)     // v3
      assert(t.headerMeta(3L).get("nr").exists(_.toLong == 70L))
      // time travel across the mixed chain
      assert(t.snapshot(Some(1L)).count() == 50L)
      assert(t.snapshot(Some(2L)).count() == 80L)
      assert(t.snapshot().count() == 70L)
      // declared schema carried by the delta commits
      assert(GraftTable.load(spark, root).tableSchema.exists(
        _.fieldNames.toSeq == Seq("k", "v")))
    }
  }
}
