package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QuerySpec

/** Golden fixtures (FIXTURES.md §A1) and the end-to-end declared query for
  * the reference-parity pipeline. The fixture payloads are embedded so the
  * whole O1→O13 chain — JSON parse, flatten, normalize, timestamp parse in
  * both reference formats (incl. a non-UTC offset), FX broadcast join,
  * audit columns, ordered projection, validation gate — is exercised and
  * oracle-checked deterministically (fixed clock, content-derived job_id).
  */
object BpiQueries {

  val disclaimer = "This data was produced from the CoinDesk Bitcoin Price Index (USD)."

  private def payload(updated: String, updatedIso: String,
      usd: String, gbp: String, eur: String): String =
    s"""{"time":{"updated":"$updated","updatedISO":"$updatedIso"},
       |"disclaimer":"$disclaimer","chartName":"Bitcoin",
       |"bpi":{"USD":{"code":"USD","symbol":"&#36;","rate":"$usd","description":"United States Dollar","rate_float":0.0},
       |"GBP":{"code":"GBP","symbol":"&pound;","rate":"$gbp","description":"British Pound Sterling","rate_float":0.0},
       |"EUR":{"code":"EUR","symbol":"&euro;","rate":"$eur","description":"Euro","rate_float":0.0}}}"""
      .stripMargin.replace("\n", "")

  /** Three observations: comma'd rates, a 2-digit-day date, and one payload
    * whose ISO timestamp carries a +07:00 offset (exercises UTC
    * normalization). */
  val goldenPayloads: Seq[String] = Seq(
    payload("Dec 6, 2022 13:31:00 UTC", "2022-12-06T13:31:00+00:00",
      "17,101.3517", "14,041.4243", "16,320.4085"),
    payload("Dec 7, 2022 02:15:30 UTC", "2022-12-07T02:15:30+00:00",
      "16,852.99", "13,900.1", "16,101.5"),
    payload("Jan 3, 2023 09:05:00 UTC", "2023-01-03T16:05:00+07:00",
      "875.5", "700", "800.25"))

  /** A payload that is not valid JSON — lands in the quarantine lane. */
  val corruptPayload: String = """{"time": {"updated": "Dec 6, 2022""""

  /** FX rates fixture (FIXTURES.md §A2). */
  def ratesDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("USD", "IDR", java.sql.Date.valueOf("2022-12-06"), 15432.5),
        Row("USD", "IDR", java.sql.Date.valueOf("2022-12-07"), 15511.25),
        Row("USD", "IDR", java.sql.Date.valueOf("2023-01-03"), 15610.0),
        // a distractor pair the enrichment must filter out
        Row("USD", "EUR", java.sql.Date.valueOf("2022-12-06"), 0.95)),
      BpiSchema.rates)
  }

  /** The full pipeline on the golden fixture, deterministic: clock fixed,
    * job_id = md5(time_updated_iso). `sfDir` is unused — the input is the
    * reference's own payload shape, not the synthetic star schema. */
  def pipelineEndToEnd(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = BpiPipeline.readRawStrings(spark, goldenPayloads)
    BpiPipeline.run(
        raw, ratesDf(spark),
        jobId = md5(col("time_updated_iso")),
        clock = to_timestamp(lit("2023-01-10 00:00:00")))
      .toDF()
      .orderBy(col("time_updated_iso"))
  }

  /** DuckDB oracle: same semantics from the same raw strings, in SQL.
    * timezone('UTC', ...) pins formatting to UTC regardless of the oracle
    * session's timezone. */
  val pipelineOracleSql: String =
    s"""WITH raw(updated, updated_iso, usd_rate, gbp_rate, eur_rate) AS (VALUES
       |  ('Dec 6, 2022 13:31:00 UTC','2022-12-06T13:31:00+00:00','17,101.3517','14,041.4243','16,320.4085'),
       |  ('Dec 7, 2022 02:15:30 UTC','2022-12-07T02:15:30+00:00','16,852.99','13,900.1','16,101.5'),
       |  ('Jan 3, 2023 09:05:00 UTC','2023-01-03T16:05:00+07:00','875.5','700','800.25')),
       |rates(rate_date, fx_rate) AS (VALUES
       |  (DATE '2022-12-06', 15432.5), (DATE '2022-12-07', 15511.25), (DATE '2023-01-03', 15610.0)),
       |t AS (SELECT
       |  strftime(timezone('UTC', strptime(updated, '%b %d, %Y %H:%M:%S %Z')), '%Y-%m-%d %H:%M:%S') AS time_updated,
       |  strftime(timezone('UTC', strptime(updated_iso, '%Y-%m-%dT%H:%M:%S%z')), '%Y-%m-%d %H:%M:%S') AS time_updated_iso,
       |  CAST(timezone('UTC', strptime(updated_iso, '%Y-%m-%dT%H:%M:%S%z')) AS DATE) AS rate_date,
       |  CAST(replace(usd_rate, ',', '') AS DOUBLE) AS bpi_usd_rate_float,
       |  CAST(replace(gbp_rate, ',', '') AS DOUBLE) AS bpi_gdp_rate_float,
       |  CAST(replace(eur_rate, ',', '') AS DOUBLE) AS bpi_eur_rate_float
       |FROM raw)
       |SELECT md5(time_updated_iso) AS job_id,
       |  '$disclaimer' AS disclaimer,
       |  'Bitcoin' AS chart_name,
       |  'USD' AS bpi_usd_code, bpi_usd_rate_float, 'United States Dollar' AS bpi_usd_description,
       |  'GBP' AS bpi_gdp_code, bpi_gdp_rate_float, 'British Pound Sterling' AS bpi_gdp_description,
       |  'EUR' AS bpi_eur_code, bpi_eur_rate_float, 'Euro' AS bpi_eur_description,
       |  bpi_usd_rate_float * fx_rate AS bpi_idr_rate_float,
       |  time_updated, time_updated_iso,
       |  '2023-01-10 00:00:00' AS last_updated
       |FROM t JOIN rates USING (rate_date)
       |ORDER BY time_updated_iso""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec.withOracle("bpi_pipeline_end_to_end", pipelineEndToEnd, pipelineOracleSql))
}
