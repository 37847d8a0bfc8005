package graft.pipeline

import org.apache.spark.sql.types._

/** Schemas for the BPI price-observation entity (SURVEY.md §1).
  *
  * Declared explicitly rather than inferred: on a 100 TB JSON landing zone,
  * schema inference is a full extra scan, and an explicit `StructType` plus
  * `PERMISSIVE` mode with a `_corrupt_record` column gives a malformed-row
  * quarantine path instead of a job failure (the reference simply crashes
  * the task on a bad payload, bpi_crawler.py:46).
  */
object BpiSchema {

  /** One currency leaf: shape per the field accesses at
    * reference dags/bpi_crawler/bpi_crawler.py:68,104-112. */
  val currency: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("symbol", StringType),
    StructField("rate", StringType),          // "17,101.3517" — thousands commas
    StructField("description", StringType),
    StructField("rate_float", DoubleType)))

  /** Raw CoinDesk BPI payload (reference bpi_crawler.py:46,101-116). */
  val raw: StructType = StructType(Seq(
    StructField("time", StructType(Seq(
      StructField("updated", StringType),     // "Dec 6, 2022 13:31:00 UTC"
      StructField("updatedISO", StringType),  // "2022-12-06T13:31:00+00:00"
      StructField("updateduk", StringType)))),
    StructField("disclaimer", StringType),
    StructField("chartName", StringType),
    StructField("bpi", StructType(Seq(
      StructField("USD", currency),
      StructField("GBP", currency),
      StructField("EUR", currency)))),
    StructField("_corrupt_record", StringType)))

  /** FX rates dimension replacing the exchangerates_data/convert HTTP call
    * (reference bpi_crawler.py:72-82): a small broadcast table keyed by
    * (from_ccy, to_ccy, rate_date). */
  val rates: StructType = StructType(Seq(
    StructField("from_ccy", StringType),
    StructField("to_ccy", StringType),
    StructField("rate_date", DateType),
    StructField("fx_rate", DoubleType)))

  /** Warehouse row: the exact 16-column contract of reference
    * bpi_crawler.py:172, GBP→"gdp" misnaming kept for schema parity
    * (bpi_crawler.py:107-109). Field order = projection order. */
  final case class EnrichedBpi(
      job_id: String,
      disclaimer: String,
      chart_name: String,
      bpi_usd_code: String,
      bpi_usd_rate_float: Double,
      bpi_usd_description: String,
      bpi_gdp_code: String,
      bpi_gdp_rate_float: Double,
      bpi_gdp_description: String,
      bpi_eur_code: String,
      bpi_eur_rate_float: Double,
      bpi_eur_description: String,
      bpi_idr_rate_float: Double,
      time_updated: String,
      time_updated_iso: String,
      last_updated: String)

  val warehouseColumns: Seq[String] = Seq(
    "job_id", "disclaimer", "chart_name",
    "bpi_usd_code", "bpi_usd_rate_float", "bpi_usd_description",
    "bpi_gdp_code", "bpi_gdp_rate_float", "bpi_gdp_description",
    "bpi_eur_code", "bpi_eur_rate_float", "bpi_eur_description",
    "bpi_idr_rate_float", "time_updated", "time_updated_iso", "last_updated")
}
