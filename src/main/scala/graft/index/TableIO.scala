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

  /** Table row count from METADATA only — the manifest's `total_rows` when
    * the table is TableIO-managed, else the parquet footers' block row
    * counts (what an Iceberg manifest records). O(files) driver-side footer
    * reads, NO Spark job: parameters derived from the corpus size (eps
    * sizing, nList sizing) must not pay a full scan pre-pass at 10^12
    * rows. */
  def rowCount(spark: SparkSession, path: String): Long = {
    manifestJson(path).flatMap { js =>
      """"total_rows":\s*(\d+)""".r.findFirstMatchIn(js).map(_.group(1).toLong)
    }.getOrElse {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try total += r.getRecordCount finally r.close()
        }
      }
      total
    }
  }

  // =================================================================
  // Versioned snapshots (the Iceberg commit protocol, emulated): each
  // commit writes immutable data files under snap-<id>/, then a manifest
  // _manifest-<id>.json, and finally flips the _current.json pointer with
  // an ATOMIC filesystem move. Readers resolve pointer → manifest → the
  // manifest's exact file list, so a writer killed at ANY point before the
  // pointer flip is invisible (old snapshot keeps serving) and never
  // corrupts the table — the north rule's "killed job resumes" contract at
  // the table layer, complementing Checkpoint's per-range lineage.
  // =================================================================

  final case class Snapshot(id: Long, totalRows: Long, files: Seq[String])

  /** Commit `df` as a new immutable snapshot of the table at `path`;
    * returns the snapshot id. Data layout matches [[writeSorted]]
    * (range-partitioned + sorted ⇒ footer min/max pruning still applies). */
  def commit(df: DataFrame, path: String, rangeKey: String,
             sortCols: Seq[String], numRanges: Int): Long = {
    val id = nextSnapshotId(path)
    val dataDir = s"$path/snap-$id"
    df.repartitionByRange(numRanges, col(rangeKey))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dataDir)
    val spark = df.sparkSession
    val written = spark.read.parquet(dataDir)
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
      s"""{"format": "graft-table-v2", "snapshot_id": $id,
         | "schema": ${q(written.schema.json)},
         | "range_key": ${q(rangeKey)},
         | "sorted_by": ${sortCols.map(q).mkString("[", ", ", "]")},
         | "num_files": ${stats.length},
         | "total_rows": ${stats.map(_.getLong(1)).sum},
         | "snapshot_ms": ${System.currentTimeMillis()},
         | "files": $files}""".stripMargin
    Files.writeString(Paths.get(path, s"_manifest-$id.json"), manifest)
    // the ONLY mutation visible to readers: an atomic pointer flip
    val tmp = Paths.get(path, s"_current.json.tmp-$id")
    Files.writeString(tmp, s"""{"snapshot_id": $id}""")
    Files.move(tmp, Paths.get(path, "_current.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    id
  }

  def currentSnapshotId(path: String): Option[Long] = {
    val p = Paths.get(path, "_current.json")
    if (!Files.exists(p)) None
    else "\"snapshot_id\": (\\d+)".r.findFirstMatchIn(Files.readString(p))
      .map(_.group(1).toLong)
  }

  private def nextSnapshotId(path: String): Long = {
    Files.createDirectories(Paths.get(path))
    currentSnapshotId(path).getOrElse(0L) + 1L
  }

  def snapshot(path: String, id: Long): Snapshot = {
    val m = Files.readString(Paths.get(path, s"_manifest-$id.json"))
    val files = "\"file\": \"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(m).map(_.group(1).replace("\\\\", "\\").replace("\\\"", "\"")).toSeq
    val rows = "\"total_rows\": (\\d+)".r.findFirstMatchIn(m).get.group(1).toLong
    Snapshot(id, rows, files)
  }

  /** Read the table at its current snapshot — exactly the committed file
    * list, never in-flight data files. */
  def readCurrent(spark: SparkSession, path: String): DataFrame = {
    val id = currentSnapshotId(path).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $path"))
    readAsOf(spark, path, id)
  }

  /** Time travel: read a specific committed snapshot. */
  def readAsOf(spark: SparkSession, path: String, id: Long): DataFrame =
    spark.read.parquet(snapshot(path, id).files: _*)

  /** Table maintenance (Iceberg's rewrite_data_files job, emulated):
    * rewrite the CURRENT snapshot into `targetFiles` range-partitioned
    * sorted files as a NEW snapshot — the small-files compaction a
    * long-lived incremental table needs (commit cadence fragments data
    * files; footer pruning and scan throughput degrade with file count).
    * The layout (range key + sort) is read back from the manifest so
    * compaction preserves the table's clustering contract; rows are
    * identical by construction, the pointer flip is atomic like any
    * commit, and pre-compaction snapshots stay time-travelable until
    * expired. Returns the new snapshot id. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Long = {
    val cur = currentSnapshotId(path).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $path"))
    val m = Files.readString(Paths.get(path, s"_manifest-$cur.json"))
    val rangeKey = "\"range_key\": \"([^\"]+)\"".r.findFirstMatchIn(m).get.group(1)
    val sortCols = "\"sorted_by\": \\[([^\\]]*)\\]".r.findFirstMatchIn(m).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    commit(readAsOf(spark, path, cur), path, rangeKey, sortCols, targetFiles)
  }

  /** Drop data + manifests of all snapshots older than the `keep` most
    * recent (the current snapshot is always retained). */
  def expireSnapshots(path: String, keep: Int): Seq[Long] = {
    val cur = currentSnapshotId(path).getOrElse(return Seq.empty)
    val ids = (1L to cur).filter(i => Files.exists(Paths.get(path, s"_manifest-$i.json")))
    val drop = ids.dropRight(math.max(keep, 1))
    drop.foreach { i =>
      val d = Paths.get(path, s"snap-$i")
      if (Files.exists(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.deleteIfExists(Paths.get(path, s"_manifest-$i.json"))
    }
    drop
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
