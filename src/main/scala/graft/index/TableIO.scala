package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Iceberg-emulated table layout (SURVEY.md §7.6): no Iceberg jars ship in
  * this sandbox, so a table = Parquet files + `_manifest.json` snapshot
  * carrying schema, sort/partition spec, per-file row counts and sort-key
  * min/max. The layout is deliberately shaped so a real Iceberg catalog can
  * replace it behind this one facade (`spark.sql.catalog.*`) without
  * touching callers: every write goes through [[writeSorted]], every read
  * through [[read]].
  */
object TableIO {

  /** Write `df` range-partitioned by `rangeKey` (typically the Hilbert order
    * of the cell key — SURVEY.md §2.G1) into `numRanges` sorted parquet
    * parts, then snapshot a manifest with per-file stats harvested from the
    * written footers. Range partitioning gives (a) clustered locality for
    * range predicates, (b) file-level min/max pruning on the sort key. */
  def writeSorted(df: DataFrame, path: String, rangeKey: String,
                  sortCols: Seq[String], numRanges: Int): Unit = {
    df.repartitionByRange(numRanges, col(rangeKey))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val stats = written
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(rangeKey)).as("lo"), max(col(rangeKey)).as("hi"))
      .orderBy("lo")
      .collect()
    val files = stats.map { r =>
      s"""{"file": ${q(r.getString(0).replaceFirst("^file:", ""))}, "rows": ${r.getLong(1)}, "lo": ${r.getLong(2)}, "hi": ${r.getLong(3)}}"""
    }.mkString("[", ", ", "]")
    val manifest =
      s"""{"format": "graft-table-v1",
         | "schema": ${q(written.schema.json)},
         | "range_key": ${q(rangeKey)},
         | "sorted_by": ${sortCols.map(q).mkString("[", ", ", "]")},
         | "num_files": ${stats.length},
         | "total_rows": ${stats.map(_.getLong(1)).sum},
         | "snapshot_ms": ${System.currentTimeMillis()},
         | "files": $files}""".stripMargin
    Files.writeString(Paths.get(path, "_manifest.json"), manifest)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def manifestJson(path: String): Option[String] = {
    val p = Paths.get(path, "_manifest.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def appendLine(path: String, line: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
