package graft.flights

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Parser for the reference's declarative JSON feature-schema format
  * (reference StreamWithStates.scala:86-165): a document of typed,
  * nullable attributes carrying semantic tags (TRACK_ID, START_TIME), a
  * geometry descriptor (esriGeometryPoint + wkid), and a time descriptor
  * (timeType Instant). The engine ingests it as a Spark `StructType`
  * whose fields carry the tags as column metadata, so tag-driven column
  * resolution (`Flights.taggedColumn`, reference
  * FeatureFunctions.scala:9-20) works on any DataFrame the schema is
  * applied to — a user's declared schema ports without hand-translation.
  *
  * Type mapping (reference dataType -> Spark): String -> StringType,
  * Date -> TimestampType (the reference parses its "Date" attributes to
  * instant millis, StreamWithStates.scala:174), Float64 -> DoubleType,
  * Int32 -> IntegerType, Int64 -> LongType. The geometry descriptor
  * becomes a `struct<x:double, y:double>` field (named by `fieldName`)
  * tagged GEOMETRY with the declared wkid in metadata — matching the
  * engine's point-struct representation (SURVEY.md §1).
  */
object FeatureSchema {

  private val mapper = new ObjectMapper()

  private def sparkType(dt: String): DataType = dt match {
    case "String"  => StringType
    case "Date"    => TimestampType
    case "Float64" => DoubleType
    case "Float32" => FloatType
    case "Int32"   => IntegerType
    case "Int64"   => LongType
    case other     => throw new IllegalArgumentException(s"unsupported dataType: $other")
  }

  /** Parse the JSON schema document into a StructType with tag metadata. */
  def fromJson(json: String): StructType = {
    val root = mapper.readTree(json)
    val attrs = Option(root.get("attributes")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    def req(n: JsonNode, field: String, ctx: String): JsonNode = {
      val v = n.get(field)
      // Jackson returns NullNode (not null) for an explicit JSON null
      require(v != null && !v.isNull, s"feature schema: missing '$field' in $ctx")
      v
    }
    val fields = attrs.map { a =>
      val name = req(a, "name", "attribute").asText()
      val dt = sparkType(req(a, "dataType", s"attribute '$name'").asText())
      val nullable = Option(a.get("nullable")).forall(_.asBoolean(true))
      val tags = Option(a.get("tags")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(t => req(t, "name", s"tag of attribute '$name'").asText())
      // ALL declared tags are kept ("tag" carries the first for the
      // common single-tag case; "tags" the full list) — dropping extras
      // would make taggedField silently miss a multi-tagged column
      val meta =
        if (tags.isEmpty) Metadata.empty
        else new MetadataBuilder()
          .putString("tag", tags.head)
          .putStringArray("tags", tags.toArray)
          .build()
      StructField(name, dt, nullable, meta)
    }
    val geomField = Option(root.get("geometry")).map { g =>
      val gt = Option(g.get("geometryType")).map(_.asText()).getOrElse("esriGeometryPoint")
      require(gt == "esriGeometryPoint", s"unsupported geometryType: $gt")
      val name = Option(g.get("fieldName")).map(_.asText()).getOrElse("Geometry")
      val wkid = Option(g.get("spatialReference")).flatMap(sr => Option(sr.get("wkid")))
        .map(_.asLong()).getOrElse(4326L)
      StructField(name,
        StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType))),
        nullable = true,
        new MetadataBuilder().putString("tag", "GEOMETRY").putLong("wkid", wkid).build())
    }
    StructType(fields ++ geomField)
  }

  /** Resolve the column carrying a semantic tag in a declared schema
    * (matches ANY of a field's declared tags, not just the first). */
  def taggedField(schema: StructType, tag: String): Option[String] =
    schema.fields.find { f =>
      (f.metadata.contains("tag") && f.metadata.getString("tag") == tag) ||
        (f.metadata.contains("tags") && f.metadata.getStringArray("tags").contains(tag))
    }.map(_.name)

  /** Stamp a DataFrame's matching columns with the declared schema's tag
    * metadata, so `Flights.taggedColumn` resolution runs off the user's
    * JSON document rather than hand-built metadata. Pure projection —
    * no data movement. */
  def applyTags(df: DataFrame, declared: StructType): DataFrame =
    declared.fields.filter(_.metadata.contains("tag")).foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d.withColumn(f.name, col(f.name).as(f.name, f.metadata))
      else d
    }
}
