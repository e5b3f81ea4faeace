package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** UNPREDICATED distributed snapshot planning (round 16, r15 stretch
  * directive #8): past `distributedPruneMinFiles`, a full-table
  * snapshot read plans from a slim (path, dvRef, ord) projection of
  * the parquet checkpoint — no resident FileEntry list, no
  * entriesCache population — while serving byte-identical content,
  * including merge-on-read DV masks and the delta-chain overlay above
  * the checkpoint. */
class DistributedSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val MinFilesKey = "spark.graft.acid.parquetCheckpointMinFiles"
  private val ShardsKey = "spark.graft.acid.checkpointShards"
  private val PruneKey = "spark.graft.acid.distributedPruneMinFiles"

  private def withDistributed[A](body: => A): A = {
    spark.conf.set(MinFilesKey, "1")
    spark.conf.set(ShardsKey, "8")
    spark.conf.set(PruneKey, "1")
    try body finally {
      spark.conf.unset(MinFilesKey); spark.conf.unset(ShardsKey)
      spark.conf.unset(PruneKey)
    }
  }

  test("a full snapshot read plans without materializing the entry list") {
    withDistributed {
      val root = graft.TempDirs.create("graft_distsnap")
      val t = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      t.append((1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(4, col("k")))                        // v1 + pcp
      t.delete(col("k") === 7L)                                  // v2: DV delta
      t.append(Seq((401L, 401.0)).toDF("k", "v"))                // v3: delta add
      // a COLD handle: nothing resident, the read must plan distributed
      val cold = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      val baseline = cold.fullResolutions.get()
      val resident = cold.residentEntryVersions
      val got = cold.snapshot().orderBy("k").select("k").as[Long].collect().toSeq
      assert(cold.fullResolutions.get() == baseline,
        "full snapshot planning must not resolve the entry list " +
          s"($baseline -> ${cold.fullResolutions.get()})")
      assert(cold.residentEntryVersions == resident,
        "full snapshot planning must not pin a resident entry list: " +
          (cold.residentEntryVersions -- resident).toString)
      // content: the DV-masked row is gone, the delta-added row present
      assert(got == ((1L to 400L).filterNot(_ == 7L) :+ 401L).sorted)
    }
  }

  test("the slim path and the driver path serve identical content") {
    withDistributed {
      val root = graft.TempDirs.create("graft_distsnap_eq")
      val t = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      t.append((1L to 100L).map(i => (i, s"s$i", i * 1.0)).toDF("k", "s", "v")
        .repartitionByRange(4, col("k")))
      t.update(col("k") === 5L, Map("v" -> (col("v") + 9.0)))
      t.delete(col("k") >= 90L)
      val cold = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      val slim = cold.snapshot().orderBy("k").collect().toSeq
      // force the classic driver resolution on a separate handle
      spark.conf.set(PruneKey, (1 << 30).toString)
      val classic = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      val full = classic.snapshot().orderBy("k").collect().toSeq
      assert(slim == full)
    }
  }
}
