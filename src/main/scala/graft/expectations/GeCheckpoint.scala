package graft.expectations

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** File-configured expectations checkpoint — the engine twin of the
  * reference's `ge.DataContext(dir).run_checkpoint("coin_checkpoint")`
  * (`dags/crypto_etl_datawarehouse_day10.py:70-84`): a JSON file in Great
  * Expectations' public suite format
  * (`great_expectations/checkpoints/coin_data_checkpoint.yml`) is parsed
  * into a [[Suite]], so validation rules live in config, not code.
  *
  * Supported expectation types map onto the engine's DSL:
  * column_to_exist, values_to_not_be_null, values_to_be_of_type
  * (float→double, int→bigint, str→string), values_to_be_greater_than,
  * values_to_be_between. Unknown types fail loudly — a silently skipped
  * expectation is a disabled quality gate.
  */
object GeCheckpoint {

  def typeFor(s: String): DataType = s match {
    case "float" | "double"         => DoubleType
    case "int" | "int64" | "bigint" => LongType
    case "str" | "object" | "text"  => StringType
    case "bool" | "boolean"         => BooleanType
    case other =>
      throw new IllegalArgumentException(s"unsupported GE type_: '$other'")
  }

  /** Load a checkpoint/suite JSON (any Hadoop-visible path) into a Suite. */
  def load(spark: SparkSession, path: String): Suite = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    parse(text)
  }

  def parse(json: String): Suite = {
    val om   = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val name = Option(root.get("expectation_suite_name")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(
        "checkpoint json missing expectation_suite_name"))
    val exps = Option(root.get("expectations")).filter(_.isArray)
      .getOrElse(throw new IllegalArgumentException(
        s"checkpoint '$name' has no expectations array"))
    import scala.jdk.CollectionConverters._
    val parsed = exps.elements().asScala.map { e =>
      val kind   = e.get("expectation_type").asText
      val kwargs = e.get("kwargs")
      require(kwargs != null && kwargs.isObject,
        s"expectation '$kind' in suite '$name' has no kwargs object")
      // Missing or null kwargs must fail LOUDLY: Jackson's NullNode.asDouble
      // is 0.0, so a one-sided between (max_value: null) would silently
      // become a 0.0 bound — a wrong gate, worse than no gate.
      def str(key: String): String = {
        val node = kwargs.get(key)
        require(node != null && node.isTextual,
          s"expectation '$kind' in suite '$name' needs string kwarg '$key'")
        node.asText
      }
      def num(key: String): Double = {
        val node = kwargs.get(key)
        require(node != null && node.isNumber,
          s"expectation '$kind' in suite '$name' needs numeric kwarg '$key' " +
            s"(one-sided bounds are not supported — use greater_than)")
        node.asDouble
      }
      // dispatch on kind BEFORE touching kwargs: a column-less table-level
      // expectation must report 'unsupported type', not 'missing column'
      kind match {
        case "expect_column_to_exist"              => ColumnExists(str("column"))
        case "expect_column_values_to_not_be_null" => NotNull(str("column"))
        case "expect_column_values_to_be_of_type" =>
          OfType(str("column"), typeFor(str("type_")))
        case "expect_column_values_to_be_greater_than" =>
          GreaterThan(str("column"), num("value"))
        case "expect_column_values_to_be_between" =>
          Between(str("column"), num("min_value"), num("max_value"))
        case other =>
          throw new IllegalArgumentException(
            s"unsupported expectation_type '$other' in suite '$name'")
      }
    }.toSeq
    Suite(name, parsed)
  }
}
