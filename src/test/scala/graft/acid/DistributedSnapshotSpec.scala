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

  test("the snapshot scan is LOG-SERVED: FileStatus from fz= tags, no listing reader") {
    // r16 directive #4 (end state): the survivor list flows straight
    // into the scan relation — the plan's leaf is a HadoopFsRelation
    // whose FileIndex is GraftLogFileIndex (path + byte length served
    // from the log's fz= tags), not an InMemoryFileIndex built by
    // re-statting every path. sizeInBytes is the exact survivor sum.
    withDistributed {
      val root = graft.TempDirs.create("graft_distsnap_logidx")
      val t = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      t.append((1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(4, col("k")))
      t.delete(col("k") === 3L)                                  // DV delta
      val cold = new GraftTable(spark, root, statsCol = Some("k"),
        checkpointInterval = 1)
      val df = cold.snapshot()
      val locations = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location
      }
      assert(locations.nonEmpty && locations.forall(
        _.isInstanceOf[GraftLogFileIndex]),
        s"expected every scan leaf log-served, got: $locations")
      val expectedBytes = locations.map(_.sizeInBytes).sum
      assert(expectedBytes > 0L, "log-served size stats must be exact")
      // content through the log-served scan, DV mask applied
      assert(df.orderBy("k").select("k").as[Long].collect().toSeq ==
        (1L to 200L).filterNot(_ == 3L))
    }
  }

  test("entries without a size tag fall back to the listing reader, same content") {
    locally {
      // default checkpoint cadence: v1 has ONLY its manifest, so the
      // in-place fz strip below is the complete pre-r17 log shape
      val root = graft.TempDirs.create("graft_distsnap_nofz")
      val t = new GraftTable(spark, root, statsCol = Some("k"))
      t.append((1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"))
      // strip the fz= tags from the manifest IN PLACE (a pre-r17 log)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val m = new org.apache.hadoop.fs.Path(root, f"_log/v${1L}%020d.manifest")
      val lines = scala.io.Source.fromInputStream(fs.open(m)).getLines()
        .map(_.split('\t').filterNot(_.startsWith("fz=")).mkString("\t"))
        .toList
      fs.delete(m, false)
      val out = fs.create(m, true)
      try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
      val cold = new GraftTable(spark, root, statsCol = Some("k"))
      val df = cold.snapshot()
      val logServed = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
            l.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.isInstanceOf[GraftLogFileIndex] => l
      }
      assert(logServed.isEmpty,
        "a size-less legacy manifest must use the listing reader")
      assert(df.count() == 50L)
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
