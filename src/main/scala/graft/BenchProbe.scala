package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 18): run the suite bench-shaped (same session confs,
  * same warm pass, same alphabetical timed loop, same noop sink) while
  * logging per-query BlockManager storage usage, persistent-RDD count,
  * and JVM GC time — to test whether the episodic mid-suite slowdowns
  * (r17's "anti-scaling cluster", this round's 8-core stream-join
  * blowup) correlate with dead-block accumulation / eviction pressure.
  * NOT part of the driver contract; Bench.scala is frozen.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchProbe"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.warm(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    System.gc(); Thread.sleep(2000); System.gc()
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def storage(): (Long, Long, Int) = {
      val sc = spark.sparkContext
      val mem = sc.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      val mx = sc.getExecutorMemoryStatus.values.map(_._1).sum
      (mem, mx, sc.getPersistentRDDs.size)
    }
    println(f"${"query"}%-32s wall_s  storMB maxMB nRDD dGC_ms")
    var lastGc = gcMs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      val wall = (System.nanoTime() - t0) / 1e9
      val (used, mx, nrdd) = storage()
      val g = gcMs()
      println(f"$name%-32s $wall%6.2f ${used / 1048576}%7d ${mx / 1048576}%5d $nrdd%4d ${g - lastGc}%6d")
      lastGc = g
    }
    spark.stop()
  }
}
