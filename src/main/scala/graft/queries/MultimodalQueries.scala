package graft.queries

import graft.QueryPack
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: typed metadata over binary payloads
  * (oracle-checked) and the partition-batched feature-extraction pass
  * (stubbed decode; Spark plumbing is real). */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> { (s, d) =>
      import s.implicits._
      MultimodalOps.payloadTable(s, d)
        .select(
          $"doc_id",
          asLong(length($"payload")).as("n_bytes"),
          asLong($"meta.width").as("width"),
          asLong($"meta.height").as("height"),
          asLong($"meta.channels").as("channels"),
          $"meta.format".as("format"))
        .orderBy($"doc_id")
    },

    "q_multimodal_features" -> { (s, d) =>
      import s.implicits._
      val payloads = MultimodalOps.payloadTable(s, d)
        .select($"doc_id", $"payload", $"meta.width".as("width"), $"meta.height".as("height"))
        .as[MultimodalOps.Payload]
      MultimodalOps.extractFeatures(payloads)
        .toDF()
        .select($"doc_id", $"n_bytes", round($"mean_byte", 6).as("mean_byte"),
                asLong(size($"histogram")).as("n_bins"))
        .orderBy($"doc_id")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(1 + n_chars % 64 AS BIGINT) AS width,
        |  CAST(1 + n_chars % 48 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  'fake/rgb8' AS format
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // features flow through the stubbed decoder, but the byte statistics
    // ARE exact over the payload bytes — expressible in SQL: mean byte of
    // ASCII text = avg(ord(ch)). NOTE: ord() is a CODEPOINT, equal to the
    // byte only for ASCII (true of all testdata text, verified); non-ASCII
    // corpora would need a byte-level oracle instead.
    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  round(CAST(list_sum(list_transform(string_split_regex(text, ''), ch -> ord(ch))) AS DOUBLE)
        |        / octet_length(encode(text)), 6) AS mean_byte,
        |  CAST(8 AS BIGINT) AS n_bins
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
