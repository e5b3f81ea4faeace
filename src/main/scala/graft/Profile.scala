package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries, n passes each in one JVM — separates
  * first-touch cost (codegen/JIT/fixture writes) from warm cost.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile <n> <query> [query ...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.head.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: no such query")
        case Some(fn) =>
          val times = (1 to n).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
