package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The DSv2 connector contract, pinned property by property: predicate
  * pushdown reaches the source, pushdown prunes generator slices at
  * planning time (before any task exists), the required-column handshake
  * narrows the read schema, and reported statistics reflect the pruned
  * range. These are the four behaviors that make an external store a
  * first-class scan at cluster scale. */
class GenSourceSpec extends SparkSpec {

  private def gen(rows: Long = 100000L, slices: Int = 32): DataFrame =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows).option("slices", slices).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("id predicates push into the source and leave no post-scan filter") {
    import spark.implicits._
    val df = gen().filter($"id" >= 20000 && $"id" < 70000).select($"bucket", $"val")
    val scan = scanOf(df)
    assert(scan.scan.description().contains("GreaterThanOrEqual(id,20000)"),
      scan.scan.description())
    assert(scan.scan.description().contains("LessThan(id,70000)"),
      scan.scan.description())
    val residualFilters = df.queryExecution.executedPlan.collect { case f: FilterExec => f }
    assert(residualFilters.isEmpty, residualFilters.mkString("\n"))
  }

  test("pushdown prunes slices at planning time: 17 of 32 survive") {
    import spark.implicits._
    // slice width = ceil(100000/32) = 3125; [20000,70000) intersects
    // slices 6..22 -> 17 partitions, planned before any task launches
    val scan = scanOf(gen().filter($"id" >= 20000 && $"id" < 70000))
    assert(scan.inputRDD.getNumPartitions === 17)
    assert(scanOf(gen()).inputRDD.getNumPartitions === 32)
  }

  test("column pruning narrows the read schema to the requested columns") {
    import spark.implicits._
    val scan = scanOf(gen().select($"bucket", $"val"))
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("bucket", "val"))
  }

  test("pruned + pushed scan still yields exactly the right rows") {
    import spark.implicits._
    val df = gen().filter($"id" >= 20000 && $"id" < 70000)
    assert(df.count() === 50000L)
    // spot-check the row recipe at the range edge
    val row = gen().filter($"id" === 20000).collect().head
    assert(row.getAs[Long]("bucket") === (20000L * 2654435761L) % 1024L)
    assert(row.getAs[Double]("val") === ((20000L * 20000L) % 997L) / 8.0)
    assert(row.getAs[String]("tag") === "t" + (20000L % 7))
  }

  test("reported statistics track the pruned range (feeds broadcast decisions)") {
    import spark.implicits._
    val full = scanOf(gen()).scan.asInstanceOf[GenScan].estimateStatistics()
    val pruned = scanOf(gen().filter($"id" < 1000)).scan
      .asInstanceOf[GenScan].estimateStatistics()
    assert(full.numRows().getAsLong === 100000L)
    assert(pruned.numRows().getAsLong === 1000L)
    assert(pruned.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong)
  }
}
