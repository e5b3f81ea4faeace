package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond parquet (SURVEY.md §2.1 ABSENT→ENGINE):
  * CSV and JSON-lines scans, exercised as write-then-read roundtrips so
  * the DuckDB oracle (over the original table) proves the format codecs
  * lose nothing. Schemas are declared, never inferred (the engine's
  * schema stance, SURVEY.md §1). */
object SourceQueries extends QueryPack {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_csv_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = tmp("graft_csv")
      val src = Tables.region(s, d)
      src.write.mode("overwrite").option("header", "true").csv(dir)
      s.read.schema(src.schema).option("header", "true").csv(dir)
        .orderBy($"r_regionkey")
    },
    "q_source_json_roundtrip" -> { (s, d) =>
      import s.implicits._
      val dir = tmp("graft_json")
      val src = Tables.nation(s, d)
      src.write.mode("overwrite").json(dir)
      s.read.schema(src.schema).json(dir)
        .orderBy($"n_nationkey")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_source_csv_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "q_source_json_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey"
  )
}
