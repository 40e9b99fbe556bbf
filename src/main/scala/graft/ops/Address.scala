package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** H8 + C5: address-range predicate (housenumber within [lfromhn, ltohn]
  * with parity) and linear interpolation of the address point along the
  * street line — carmen's `applyaddress` semantics (upstream
  * `lib/pure/applyaddress.js` [U]) re-expressed as pure column arithmetic
  * so it is both codegen'd and oracle-mirrorable.
  */
object Address {

  /** C5: eligibility — from <= h <= to and parity matches (O/E/B). */
  def inRange(h: Column, from: Column, to: Column, parity: Column): Column =
    h >= from && h <= to &&
      (parity === "B" ||
        (parity === "O" && h % 2 === 1) ||
        (parity === "E" && h % 2 === 0))

  /** H8: position along the segment (x0,y0)→(x1,y1) at fraction
    * (h - from) / (to - from); degenerate ranges pin to the start. */
  def interpLon(h: Column, from: Column, to: Column, x0: Column, x1: Column): Column =
    when(to === from, x0)
      .otherwise(x0 + (h - from).cast("double") / (to - from).cast("double") * (x1 - x0))
  def interpLat(h: Column, from: Column, to: Column, y0: Column, y1: Column): Column =
    when(to === from, y0)
      .otherwise(y0 + (h - from).cast("double") / (to - from).cast("double") * (y1 - y0))

  /** Street segments derived from the supplier table (deterministic, SQL-
    * mirrored): a horizontal 0.01° segment per supplier with an odd housenum
    * range keyed on s_suppkey. */
  def streets(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("s_suppkey").cast("long")
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(k.as("street_id"),
        ((k * 7919 % 350000) / 1000.0 - 175.0).as("x0"),
        ((k * 104729 % 160000) / 1000.0 - 80.0).as("y0"),
        ((k % 50) * 2 + 1).as("fromhn"),
        ((k % 50) * 2 + 99).as("tohn"),
        when(k % 3 === 0, "O").when(k % 3 === 1, "E").otherwise("B").as("parity"))
      .withColumn("x1", col("x0") + lit(0.01))
      .withColumn("y1", col("y0"))
  }

  def streetsSql: String =
    """SELECT CAST(s_suppkey AS BIGINT) AS street_id,
      |       ((s_suppkey * 7919) % 350000) / 1000.0 - 175.0 AS x0,
      |       ((s_suppkey * 104729) % 160000) / 1000.0 - 80.0 AS y0,
      |       (s_suppkey % 50) * 2 + 1 AS fromhn,
      |       (s_suppkey % 50) * 2 + 99 AS tohn,
      |       CASE WHEN s_suppkey % 3 = 0 THEN 'O'
      |            WHEN s_suppkey % 3 = 1 THEN 'E' ELSE 'B' END AS parity,
      |       ((s_suppkey * 7919) % 350000) / 1000.0 - 175.0 + 0.01 AS x1,
      |       ((s_suppkey * 104729) % 160000) / 1000.0 - 80.0 AS y1
      |FROM supplier""".stripMargin

  /** Query: interpolate deterministic probe housenumbers against their
    * street's range (the query housenumber is keyed off the street id). */
  def interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val st = streets(spark, sfDir)
      .withColumn("h", (col("street_id") * 13 % 120 + 1).cast("long"))
    st.filter(inRange(col("h"), col("fromhn"), col("tohn"), col("parity")))
      .select(col("street_id"), col("h"),
        interpLon(col("h"), col("fromhn"), col("tohn"), col("x0"), col("x1")).as("alon"),
        interpLat(col("h"), col("fromhn"), col("tohn"), col("y0"), col("y1")).as("alat"))
  }

  def interpolateSql: String =
    s"""WITH st AS (${streetsSql}),
       |probe AS (SELECT *, (street_id * 13) % 120 + 1 AS h FROM st)
       |SELECT street_id, CAST(h AS BIGINT) AS h,
       |       CASE WHEN tohn = fromhn THEN x0
       |            ELSE x0 + CAST(h - fromhn AS DOUBLE) / CAST(tohn - fromhn AS DOUBLE) * (x1 - x0) END AS alon,
       |       CASE WHEN tohn = fromhn THEN y0
       |            ELSE y0 + CAST(h - fromhn AS DOUBLE) / CAST(tohn - fromhn AS DOUBLE) * (y1 - y0) END AS alat
       |FROM probe
       |WHERE h >= fromhn AND h <= tohn
       |  AND (parity = 'B' OR (parity = 'O' AND h % 2 = 1)
       |       OR (parity = 'E' AND h % 2 = 0))""".stripMargin
}
