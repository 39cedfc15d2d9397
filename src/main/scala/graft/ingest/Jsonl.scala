package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus reader — the LLM dataset interchange format (one JSON
  * object per line: The Pile, RedPajama, Dolma, FineWeb all ship it).
  * Same discipline as the null-delimited CSV path (`MuprReader`,
  * mirroring the reference's quarantine at `Utils.scala:119-167`):
  *
  *  - schema EXPLICIT — inference at 100 TB is a full extra pass over
  *    every byte before the real one, and a schema drifting with the
  *    sampled files is a silent-corruption source;
  *  - ONE parse with malformed-line capture (`from_json` PERMISSIVE +
  *    `_corrupt_record`): clean rows and the dead-letter frame come
  *    from the same evaluation, so clean-row semantics cannot diverge
  *    between the two readers — or between batch and streaming, which
  *    share [[parse]] (the muprStream pattern).
  */
object Jsonl {

  /** Parse a one-string-column frame of JSONL lines into `schema` rows
    * plus the capture column. `lines` may be batch or streaming. */
  def parse(lines: DataFrame, line: Column, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not predeclare _corrupt_record — the parser adds it")
    val full = schema.add("_corrupt_record", StringType)
    lines.select(line.as("__line"))
      .select(col("__line"), from_json(col("__line"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
  }

  /** Typed clean rows of a JSONL file/glob. */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    cleanFrom(spark.read.text(path), schema)

  /** Clean rows from an already-loaded text frame (column `value`) —
    * the form the streaming file source needs. */
  def cleanFrom(lines: DataFrame, schema: StructType): DataFrame =
    parse(lines, col("value"), schema)
      .where(col("r._corrupt_record").isNull &&
        // a line of whitespace parses as an all-null row, not corrupt —
        // PERMISSIVE's known blind spot; a null struct is no document
        col("r").isNotNull)
      .select(col("r.*")).drop("_corrupt_record")

  /** The dead-letter frame: every malformed line verbatim, for
    * quarantine-and-audit (never silently dropped at 100 TB). */
  def readCorrupt(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    parse(spark.read.text(path), col("value"), schema)
      .where(col("r._corrupt_record").isNotNull || col("r").isNull)
      .select(col("__line").as("_corrupt_record"))
}
