package graft.sources

import java.util

import graft.schema.CoinSchemas
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 realization of the CoinGecko REST source (SURVEY §2.1 S1):
  *
  * ```
  * spark.read.format("coin-markets").option("path", fixture).load()   // file
  * spark.read.format("coin-markets").option("url", endpoint).load()   // HTTP
  * ```
  *
  * A REST page is a driver-sized payload (100 records), so the scan
  * implements [[LocalScan]] — the rows materialize on the driver and Spark
  * plans a LocalTableScan, with no pointless executor round-trip for a
  * payload that came through the driver's socket anyway. Parsing reuses
  * Spark's own JacksonParser with the same options as the bronze reader
  * (multiLine array root, `NaN` tolerated).
  */
class CoinMarketsTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "coin-markets"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CoinSchemas.bronze

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CoinMarketsTable(schema, properties.asScala.toMap)
}

final class CoinMarketsTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "coin_markets"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def schema(): StructType = schema

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = props ++ options.asScala
    () => new CoinMarketsScan(schema, opts)
  }
}

final class CoinMarketsScan(schema: StructType, opts: Map[String, String])
    extends Scan with LocalScan {

  override def readSchema(): StructType = schema
  override def description(): String = s"CoinMarketsScan(${opts.keys.mkString(",")})"

  private def fetcher: CoinMarketsFetcher =
    (opts.get("path"), opts.get("url")) match {
      case (Some(p), _) => new FixtureCoinMarketsFetcher(p)
      // retryDelayMs defaults SHORT here: a Spark scan blocking minutes
      // between attempts holds the slot hostage — the reference's 5-minute
      // retry spacing is an ORCHESTRATOR (Airflow) concern, and belongs to
      // whatever reruns the job, not inside the read path.
      case (_, Some(u)) => new HttpCoinMarketsFetcher(u,
        timeoutSeconds = opts.getOrElse("timeoutSeconds", "10").toLong,
        retries = opts.getOrElse("retries", "1").toInt,
        retryDelayMs = opts.getOrElse("retryDelayMs", "1000").toLong)
      case _ => throw new IllegalArgumentException(
        "coin-markets source needs option 'path' (fixture file) or 'url'")
    }

  override def rows(): Array[InternalRow] = {
    val json = fetcher.fetchJson()
    val jsonOpts = new JSONOptions(
      Map("multiLine" -> "true", "allowNonNumericNumbers" -> "true"),
      "UTC")
    val parser = new JacksonParser(schema, jsonOpts, allowArrayAsStructs = true)
    // PERMISSIVE wrapper, same as spark.read.json: malformed fields (the
    // reference's bare-NaN roi) null out instead of failing the scan.
    val safe = new org.apache.spark.sql.catalyst.util.FailureSafeParser[String](
      input => parser.parse(input, CreateJacksonParser.string, UTF8String.fromString),
      jsonOpts.parseMode, schema, jsonOpts.columnNameOfCorruptRecord)
    safe.parse(json)
      .map(_.copy())   // the parser reuses its row buffer
      .toArray
  }
}
