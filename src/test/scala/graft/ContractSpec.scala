package graft

import graft.contract.{SchemaContract, SchemaContractViolation}
import graft.schema.CoinSchemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ContractSpec extends SparkTestBase {

  private val contract = CoinSchemas.silverV1
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def silverDf(rows: Seq[Row]) = {
    // Build with all-nullable schema: enforcement, not declaration, must catch nulls.
    val loose = StructType(contract.fields.map(_.copy(nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), loose)
  }

  private val goodRow =
    Row("bitcoin", "btc", "Bitcoin", 91343.0, 1.8e12, ts("2026-01-13 04:16:20"))

  test("clean frame passes and conforms column order/types") {
    val out = SchemaContract.enforce(silverDf(Seq(goodRow)), contract)
    out.columns.toSeq shouldBe contract.fieldNames.toSeq
    out.count() shouldBe 1
  }

  test("null in any required field fails with a per-column count") {
    val bad = Row(null, "btc", "Bitcoin", 91343.0, 1.8e12, ts("2026-01-13 04:16:20"))
    val e = intercept[SchemaContractViolation] {
      SchemaContract.enforce(silverDf(Seq(goodRow, bad)), contract)
    }
    e.getMessage should include("coin_id")
    e.getMessage should include("1 rows")
  }

  test("NaN in a non-nullable double field is a violation (pandas-NaN parity)") {
    val bad = Row("ethereum", "eth", "Ethereum", Double.NaN, 4.0e11, ts("2026-01-13 04:16:20"))
    val e = intercept[SchemaContractViolation] {
      SchemaContract.enforce(silverDf(Seq(goodRow, bad)), contract)
    }
    e.getMessage should include("price_usd")
  }

  test("missing required column fails fast without running a job") {
    val df = silverDf(Seq(goodRow)).drop("symbol")
    val e = intercept[SchemaContractViolation] {
      SchemaContract.enforce(df, contract)
    }
    e.getMessage should include("missing required columns: symbol")
  }

  test("uncastable string counts as a cast violation") {
    val schema = StructType(Seq(StructField("price_usd", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("12.5"), Row("not-a-number"))), schema)
    val tight = StructType(Seq(StructField("price_usd", DoubleType, nullable = false)))
    val e = intercept[SchemaContractViolation] { SchemaContract.enforce(df, tight) }
    e.getMessage should include("price_usd")
  }

  test("property: enforcement rejects iff some required field is null/NaN") {
    val rowGen: Gen[(Row, Boolean)] = for {
      id    <- Gen.option(Gen.alphaStr.map(s => s"id_$s"))
      price <- Gen.oneOf(Gen.choose(0.01, 1e6), Gen.const(Double.NaN))
    } yield {
      val bad = id.isEmpty || price.isNaN
      (Row(id.orNull, "sym", "name", price, 1.0, ts("2026-01-13 00:00:00")), bad)
    }
    val prop = Prop.forAll(Gen.listOfN(8, rowGen)) { rows =>
      val expectBad = rows.exists(_._2)
      val df = silverDf(rows.map(_._1))
      val threw =
        try { SchemaContract.enforce(df, contract).count(); false }
        catch { case _: SchemaContractViolation => true }
      threw == expectBad
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
