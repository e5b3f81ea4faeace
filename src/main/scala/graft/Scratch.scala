package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm the JVM/session on an unrelated query
    SparkEntry.queries("q_sort_topn")(spark, sfDir).write.format("noop").mode("overwrite").save()
    args.foreach { q =>
      time(q + " run1") { SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save() }
      time(q + " run2") { SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
