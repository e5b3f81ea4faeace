package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The bus DSv2 WRITE path: batch append, partition routing (explicit
  * column + key-hash), streaming sink with idempotent epoch commit, and
  * staging hygiene. */
class BusSinkSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  private def readBack(root: String) =
    spark.read.format("graft-bus").option("path", root).load()

  test("batch write appends records routed by the partition column") {
    val root = graft.TempDirs.create("graft_bus_sink_batch")
    val df = (0 until 12).toDF("i").select(
      $"i".cast("string").cast("binary").as("key"),
      concat(lit("v"), $"i").cast("binary").as("value"),
      ($"i" % 3).cast("int").as("partition"),
      (lit(5000000L) + $"i").cast("long").as("timestamp"))
    df.coalesce(1).write.format("graft-bus").option("path", root)
      .mode("append").save()
    val back = readBack(root)
      .select($"partition", $"offset", $"key".cast("string"),
        $"value".cast("string"), $"timestamp")
      .as[(Int, Long, String, String, Long)].collect()
    assert(back.length == 12)
    // 4 records per partition, contiguous offsets from 0
    (0 until 3).foreach { p =>
      val offs = back.filter(_._1 == p).map(_._2).sorted.toSeq
      assert(offs == (0L to 3L), s"partition $p offsets: $offs")
    }
    // values and timestamps round-trip
    val r7 = back.find(_._3 == "7").get
    assert(r7._1 == 1 && r7._4 == "v7" && r7._5 == 5000007L)
    // the segment name carries the task's ts bounds (time index from write)
    val pdir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), "p0")
    val seg = BusLog.segments(pdir.getFileSystem(conf), pdir).head
    assert(seg.tsMin.nonEmpty && seg.tsMax.nonEmpty && seg.tsMin.get <= seg.tsMax.get)
    // a second append lands as a follow-on segment, offsets continue
    df.coalesce(1).write.format("graft-bus").option("path", root)
      .mode("append").save()
    val offs2 = readBack(root).filter($"partition" === 0)
      .select($"offset").as[Long].collect().sorted.toSeq
    assert(offs2 == (0L to 7L), s"got $offs2")
    // staging dir is cleared after commit
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_staged")),
      "staging must be cleaned up on commit")
  }

  test("key-hash routing when no partition column (numPartitions option)") {
    val root = graft.TempDirs.create("graft_bus_sink_hash")
    val df = (0 until 40).toDF("i").select(
      $"i".cast("string").cast("binary").as("key"),
      $"i".cast("string").cast("binary").as("value"))
    df.write.format("graft-bus").option("path", root)
      .option("numPartitions", "4").mode("append").save()
    val byPart = readBack(root)
      .select($"partition", $"key".cast("string"))
      .as[(Int, String)].collect()
    assert(byPart.length == 40)
    assert(byPart.map(_._1).distinct.sorted.toSeq.forall(p => p >= 0 && p < 4))
    assert(byPart.map(_._1).distinct.length > 1, "hash must spread keys")
    // same key always lands in the same partition (producer contract)
    val again = graft.TempDirs.create("graft_bus_sink_hash2")
    df.write.format("graft-bus").option("path", again)
      .option("numPartitions", "4").mode("append").save()
    val byPart2 = spark.read.format("graft-bus").option("path", again).load()
      .select($"partition", $"key".cast("string")).as[(Int, String)].collect()
    assert(byPart.toSet == byPart2.toSet, "routing must be deterministic")
  }

  test("value column is required and unknown columns are rejected") {
    val root = graft.TempDirs.create("graft_bus_sink_badschema")
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("; ")
    val noValue = intercept[Throwable] {
      Seq(1, 2).toDF("i").select($"i".cast("string").cast("binary").as("key"))
        .write.format("graft-bus").option("path", root).mode("append").save()
    }
    assert(msgs(noValue).contains("'value'"), s"got: ${msgs(noValue)}")
    val unknown = intercept[Throwable] {
      Seq(1, 2).toDF("i").select(
        $"i".cast("string").cast("binary").as("value"), $"i".as("extra"))
        .write.format("graft-bus").option("path", root).mode("append").save()
    }
    assert(msgs(unknown).contains("unknown columns"), s"got: ${msgs(unknown)}")
  }

  test("streaming sink delivers each record once and an epoch replay is a no-op") {
    val srcRoot = graft.TempDirs.create("graft_bus_sink_src")
    val dstRoot = graft.TempDirs.create("graft_bus_sink_dst")
    val ckpt = graft.TempDirs.create("graft_bus_sink_ckpt")
    BusLog.append(conf, srcRoot, 0, (0 until 6).map { i =>
      (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), 1000L + i)
    })
    def pump(): Unit = {
      val q = spark.readStream.format("graft-bus").option("path", srcRoot).load()
        .select($"key", $"value", $"partition", $"timestamp")
        .writeStream.format("graft-bus").option("path", dstRoot)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    val got = readBack(dstRoot).select($"value".cast("string")).as[String]
      .collect().sorted.toSeq
    assert(got == (0 until 6).map(i => s"v$i"), s"got $got")
    // re-running against the same checkpoint moves nothing (source side)
    // and, even if the engine replayed the epoch, the marker dedups it
    pump()
    assert(readBack(dstRoot).count() == 6, "no duplicates across restart")
    // unit-level: direct re-commit of a committed epoch publishes nothing
    val fs = new org.apache.hadoop.fs.Path(dstRoot).getFileSystem(conf)
    val markers = fs.listStatus(
      new org.apache.hadoop.fs.Path(dstRoot, "_epochs")).map(_.getPath.getName)
    assert(markers.nonEmpty, "committed epochs leave markers")
    // new records flow through a THIRD run incrementally
    BusLog.append(conf, srcRoot, 0, Seq(
      ("k9".getBytes("UTF-8"), "v9".getBytes("UTF-8"), 2000L)))
    pump()
    assert(readBack(dstRoot).count() == 7)
  }

  test("a multi-task write publishes one segment per (task, partition) with contiguous offsets") {
    val root = graft.TempDirs.create("graft_bus_sink_multi")
    val df = (0 until 100).toDF("i").repartition(8).select(
      $"i".cast("string").cast("binary").as("key"),
      $"i".cast("string").cast("binary").as("value"),
      ($"i" % 2).cast("int").as("partition"))
    df.write.format("graft-bus").option("path", root).mode("append").save()
    val back = readBack(root).select($"partition", $"offset", $"value".cast("string"))
      .as[(Int, Long, String)].collect()
    assert(back.length == 100)
    (0 to 1).foreach { p =>
      val offs = back.filter(_._1 == p).map(_._2).sorted.toSeq
      assert(offs == (0L until offs.length.toLong), s"contiguous offsets for p$p")
    }
    assert(back.map(_._3).distinct.length == 100, "every record exactly once")
    val pdir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), "p0")
    assert(BusLog.segments(pdir.getFileSystem(conf), pdir).size > 1,
      "parallel tasks each publish their own segment")
  }

  test("BATCH commit is exactly-once: marker short-circuits a retry, plan resumes a crash") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriterCommitMessage}
    import org.apache.spark.sql.types.{BinaryType, StructType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = graft.TempDirs.create("graft_bus_sink_batchcrash")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val qid = "batch-q1"
    def stageFile(name: String, recs: Seq[(String, String, Long)]): String = {
      val p = new Path(rootPath, s"_staged/$qid/$name")
      fs.mkdirs(p.getParent)
      val b64 = java.util.Base64.getEncoder
      val out = fs.create(p, true)
      try out.write(recs.map { case (k, v, ts) =>
        s"${b64.encodeToString(k.getBytes("UTF-8"))}\t" +
          s"${b64.encodeToString(v.getBytes("UTF-8"))}\t$ts"
      }.mkString("\n").getBytes("UTF-8") ++ "\n".getBytes("UTF-8"))
      finally out.close()
      p.toString
    }
    val f1 = stageFile("t0-p0.log", Seq(("a", "va", 10L), ("b", "vb", 11L)))
    val f2 = stageFile("t1-p0.log", Seq(("c", "vc", 12L), ("d", "vd", 13L)))
    def messages: Array[WriterCommitMessage] =
      Array(BusWriteMessage(0L, Seq((0, f1, 2L, 10L, 11L))),
            BusWriteMessage(1L, Seq((0, f2, 2L, 12L, 13L))))
    val info = new LogicalWriteInfo {
      override def queryId(): String = qid
      override def schema(): StructType = new StructType().add("value", BinaryType)
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    }
    val bw = new BusWrite(root, info).toBatch
    bw.commit(messages)
    assert(readBack(root).count() == 4L)
    assert(fs.exists(new Path(rootPath, s"_epochs/$qid-batch")),
      "a committed batch leaves its marker")
    // engine-side COMMIT RETRY (same write, staged files already gone):
    // the marker must short-circuit — without it this would throw or
    // double-publish
    bw.commit(messages)
    assert(readBack(root).count() == 4L, "a retried batch commit re-published")
    // CRASH-RESUME twin: fresh write whose plan landed but whose publish
    // stopped after the first rename — the re-driven commit must finish
    // the plan at its PINNED offsets
    val qid2 = "batch-q2"
    def stage2(name: String, recs: Seq[(String, String, Long)]): String = {
      val p = new Path(rootPath, s"_staged/$qid2/$name")
      fs.mkdirs(p.getParent)
      val b64 = java.util.Base64.getEncoder
      val out = fs.create(p, true)
      try out.write(recs.map { case (k, v, ts) =>
        s"${b64.encodeToString(k.getBytes("UTF-8"))}\t" +
          s"${b64.encodeToString(v.getBytes("UTF-8"))}\t$ts"
      }.mkString("\n").getBytes("UTF-8") ++ "\n".getBytes("UTF-8"))
      finally out.close()
      p.toString
    }
    val g1 = stage2("t0-p0.log", Seq(("e", "ve", 20L)))
    val g2 = stage2("t1-p0.log", Seq(("f", "vf", 21L), ("g", "vg", 22L)))
    val messages2: Array[WriterCommitMessage] =
      Array(BusWriteMessage(0L, Seq((0, g1, 1L, 20L, 20L))),
            BusWriteMessage(1L, Seq((0, g2, 2L, 21L, 22L))))
    val plan2 = new Path(rootPath, s"_epochs/$qid2-batch.plan")
    BusCommit.publishPlanned(conf, root, s"$root/_staged/$qid2", messages2, plan2)
    assert(fs.exists(plan2), "plan persists until the marker lands")
    // rebuild the crash state: second segment unpublished, file re-staged
    val lines = scala.io.Source.fromInputStream(fs.open(plan2)).getLines().toList
    val Array(_, _, segName) = lines(1).split('\t')
    fs.delete(new Path(new Path(rootPath, "p0"), segName), false)
    stage2("t1-p0.log", Seq(("f", "vf", 21L), ("g", "vg", 22L)))
    val info2 = new LogicalWriteInfo {
      override def queryId(): String = qid2
      override def schema(): StructType = new StructType().add("value", BinaryType)
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    }
    new BusWrite(root, info2).toBatch.commit(messages2)
    val back = readBack(root).select($"offset", $"value".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == (0L until 7L),
      s"contiguous offsets after the resumed batch: ${back.toSeq}")
    assert(back.map(_._2).toSeq ==
      Seq("va", "vb", "vc", "vd", "ve", "vf", "vg"),
      "every batch record exactly once, in planned order")
    assert(fs.exists(new Path(rootPath, s"_epochs/$qid2-batch")))
  }

  test("epoch markers sweep past the retention window, one writer at a time") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriterCommitMessage}
    import org.apache.spark.sql.types.{BinaryType, StructType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = graft.TempDirs.create("graft_bus_sink_sweep")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val qid = "sweep-q"
    def mark(name: String): Unit = {
      val p = new Path(rootPath, s"_epochs/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true); out.close()
    }
    // old + recent markers for this writer, another writer's, a batch one
    mark(s"$qid-1"); mark(s"$qid-2"); mark(s"$qid-190")
    mark("other-q-1"); mark(s"$qid-batch")
    val p = new Path(rootPath, s"_staged/$qid/e192/t0-p0.log")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(("AA==\tAA==\t1\n").getBytes("UTF-8")); out.close()
    val info = new LogicalWriteInfo {
      override def queryId(): String = qid
      override def schema(): StructType = new StructType().add("value", BinaryType)
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    }
    val msgs: Array[WriterCommitMessage] =
      Array(BusWriteMessage(0L, Seq((0, p.toString, 1L, 1L, 1L))))
    new BusWrite(root, info).toStreaming.commit(192L, msgs)
    def exists(n: String) = fs.exists(new Path(rootPath, s"_epochs/$n"))
    assert(!exists(s"$qid-1") && !exists(s"$qid-2"),
      "markers >128 epochs behind must sweep")
    assert(exists(s"$qid-190") && exists(s"$qid-192"),
      "recent markers stay")
    assert(exists("other-q-1") && exists(s"$qid-batch"),
      "other writers' and batch markers are never touched")
  }

  test("a crash mid-publish resumes from the epoch plan: no duplicate, no loss") {
    import org.apache.hadoop.fs.Path
    val root = graft.TempDirs.create("graft_bus_sink_crash")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    // an existing segment so planned offsets start past zero
    BusLog.append(conf, root, 0, (0 until 4).map(i =>
      (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), 100L + i)))
    // two staged task files for the epoch (2 + 3 records)
    def stageFile(name: String, recs: Seq[(String, String, Long)]): String = {
      val p = new Path(rootPath, s"_staged/q1/e7/$name")
      fs.mkdirs(p.getParent)
      val b64 = java.util.Base64.getEncoder
      val out = fs.create(p, true)
      try out.write(recs.map { case (k, v, ts) =>
        s"${b64.encodeToString(k.getBytes("UTF-8"))}\t" +
          s"${b64.encodeToString(v.getBytes("UTF-8"))}\t$ts"
      }.mkString("\n").getBytes("UTF-8") ++ "\n".getBytes("UTF-8"))
      finally out.close()
      p.toString
    }
    val f1 = stageFile("t0-p0.log", Seq(("a", "va", 200L), ("b", "vb", 201L)))
    val f2 = stageFile("t1-p0.log", Seq(("c", "vc", 202L), ("d", "vd", 203L), ("e", "ve", 204L)))
    val messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(BusWriteMessage(0L, Seq((0, f1, 2L, 200L, 201L))),
            BusWriteMessage(1L, Seq((0, f2, 3L, 202L, 204L))))
    val plan = new Path(rootPath, "_epochs/q1-7.plan")
    // FIRST attempt: plan lands, then "crash" after only the first rename —
    // simulated by executing the plan's first entry by hand
    BusCommit.publishPlanned(conf, root, s"$root/_staged/q1/e7", messages, plan)
    // publishPlanned above ran to completion; rebuild the crash state:
    // re-stage f2, delete its published segment, keep f1's — exactly the
    // on-disk state a crash between the two renames leaves
    assert(fs.exists(plan), "the plan persists until the marker is written")
    val planLines = scala.io.Source.fromInputStream(fs.open(plan)).getLines().toList
    assert(planLines.size == 2)
    val Array(_, _, seg2Name) = planLines(1).split('\t')
    val seg2 = new Path(new Path(rootPath, "p0"), seg2Name)
    assert(fs.exists(seg2))
    fs.delete(seg2, false)
    stageFile("t1-p0.log", Seq(("c", "vc", 202L), ("d", "vd", 203L), ("e", "ve", 204L)))
    // RESTART: the replayed commit must finish the plan — f2 publishes at
    // its PINNED offset, f1's already-published segment is not duplicated
    BusCommit.publishPlanned(conf, root, s"$root/_staged/q1/e7", messages, plan)
    val back = readBack(root).select($"offset", $"value".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == (0L to 8L), s"contiguous offsets: ${back.toSeq}")
    assert(back.map(_._2).toSeq ==
      Seq("v0", "v1", "v2", "v3", "va", "vb", "vc", "vd", "ve"),
      "every record exactly once, in planned order")
  }

  test("stale -batch markers age out of _epochs on later batch writes") {
    val root = graft.TempDirs.create("graft_bus_sink_sweep")
    def write(n: Int, tag: String): Unit =
      (0 until n).toDF("i").select(
        concat(lit(tag), $"i").cast("binary").as("value"))
        .coalesce(1).write.format("graft-bus").option("path", root)
        .mode("append").save()
    write(3, "a")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val epochs = new org.apache.hadoop.fs.Path(root, "_epochs")
    val first = fs.listStatus(epochs).map(_.getPath)
      .filter(_.getName.endsWith("-batch")).toSeq
    assert(first.nonEmpty)
    // age the first write's marker past retention; plant a stale orphaned
    // plan file too (a crash can leave one behind)
    val old = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    first.foreach(p => fs.setTimes(p, old, -1))
    val orphanPlan = new org.apache.hadoop.fs.Path(epochs, "deadbeef-batch.plan")
    fs.create(orphanPlan, true).close()
    fs.setTimes(orphanPlan, old, -1)
    // a recent foreign marker must survive the sweep
    val recent = new org.apache.hadoop.fs.Path(epochs, "cafe-batch")
    fs.create(recent, true).close()
    write(2, "b")
    val names = fs.listStatus(epochs).map(_.getPath.getName).toSet
    assert(!names.contains(orphanPlan.getName), "stale orphan plan swept")
    first.foreach(p => assert(!names.contains(p.getName), "stale marker swept"))
    assert(names.contains(recent.getName), "recent markers are kept")
    assert(names.exists(n => n.endsWith("-batch") && n != recent.getName),
      "the fresh write's own marker remains")
    assert(readBack(root).count() == 5, "sweeping never loses records")
  }
}
