package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert/insert-ignore sink (SURVEY §2.1 S6-S8). `df.write.jdbc` can
  * only append/overwrite, so conflict-key semantics are a custom
  * `foreachPartition` sink issuing batched `INSERT … ON CONFLICT` statements
  * — the executor-parallel equivalent of the reference's
  * `execute_values(page_size=1000)` (`dags/coin_data_pipeline_optimized.py:
  * 578-589, 672-677, 923-933`). Each Spark partition opens one connection and
  * writes in `batchSize` chunks inside a transaction, so throughput scales
  * with executor count instead of a single driver loop.
  *
  * SQL generation is separated from execution so the statement text is
  * unit-testable without a database (the build environment has none).
  */
object JdbcUpsertSink {

  /** `INSERT … ON CONFLICT (keys) DO NOTHING` statement for `table`. */
  def insertIgnoreSql(table: String, columns: Seq[String], keys: Seq[String]): String = {
    val cols = columns.mkString(", ")
    val ph   = columns.map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($ph) ON CONFLICT (${keys.mkString(", ")}) DO NOTHING"
  }

  /** `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c` statement —
    * last-writer-wins on the non-key columns (reference `:923-933` updates
    * only the metric columns).
    */
  def upsertSql(table: String, columns: Seq[String], keys: Seq[String]): String = {
    val sets = columns.filterNot(keys.contains).map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"${insertIgnoreSql(table, columns, keys).stripSuffix(" DO NOTHING")} DO UPDATE SET $sets"
  }

  /** SQL type for a CAST in the ANSI MERGE source row — parameters inside a
    * `USING (VALUES …)` derived table are untyped in strict engines (Derby),
    * so every placeholder is cast from the DataFrame schema.
    */
  def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType        => "BIGINT"
      case IntegerType     => "INTEGER"
      case ShortType       => "SMALLINT"
      case DoubleType      => "DOUBLE"
      case FloatType       => "REAL"
      case BooleanType     => "BOOLEAN"
      case DateType        => "DATE"
      case TimestampType   => "TIMESTAMP"
      // Derby/DB2 cap DECIMAL precision at 31 (Spark's default is 38,18)
      case d: DecimalType =>
        val p = math.min(d.precision, 31)
        s"DECIMAL($p,${math.min(d.scale, p)})"
      case StringType      => "VARCHAR(4000)"
      case other => throw new IllegalArgumentException(
        s"no JDBC merge mapping for ${other.simpleString}")
    }
  }

  private val VarcharWidth = """(?i)(?:VARCHAR|CHAR)\s*\(\s*(\d+)\s*\)""".r

  /** A generated statement plus the DataFrame-column order its `?`
    * placeholders bind in (a column may repeat — MERGE references the key
    * in the ON clause and again in the INSERT values). `varcharWidths`
    * carries each string column's declared width so [[write]] can fail
    * loudly on an over-long value instead of letting the CAST silently
    * truncate it.
    */
  final case class Statement(sql: String, paramColumns: Seq[String],
      varcharWidths: Map[String, Int] = Map.empty)

  /** ANSI `MERGE INTO` upsert for engines whose MERGE source must be a base
    * table (Derby, DB2): the one-row dummy table `SYSIBM.SYSDUMMY1` drives
    * the merge and every value arrives as a CAST parameter in the clause
    * that needs it — keys in ON, all columns in INSERT, non-keys in UPDATE
    * (`updateOnMatch = true`) or no matched-clause at all (insert-ignore).
    * Parameters inside MERGE are untyped in strict engines, hence the casts
    * from the DataFrame schema.
    *
    * String columns default to `VARCHAR(4000)`; when the target column is
    * wider (or narrower), pass its real SQL type in `typeOverrides`
    * (e.g. `Map("body" -> "VARCHAR(32000)")`) — the CAST would otherwise
    * silently truncate longer values. [[write]] additionally checks every
    * bound string against the declared width and fails loudly on overflow.
    */
  def mergeSql(table: String, schema: org.apache.spark.sql.types.StructType,
      keys: Seq[String], updateOnMatch: Boolean,
      typeOverrides: Map[String, String] = Map.empty): Statement = {
    val columns = schema.fields.map(_.name).toSeq
    require(keys.nonEmpty && keys.forall(columns.contains), s"keys $keys must be columns")
    require(typeOverrides.keySet.subsetOf(columns.toSet),
      s"typeOverrides ${typeOverrides.keySet} must be columns")
    def typeOf(c: String): String =
      typeOverrides.getOrElse(c, sqlType(schema(c).dataType))
    def cast(c: String): String = s"CAST(? AS ${typeOf(c)})"
    val widths = columns.flatMap { c =>
      typeOf(c) match {
        case VarcharWidth(w) => Some(c -> w.toInt)
        case _               => None
      }
    }.toMap
    val on  = keys.map(k => s"t.$k = ${cast(k)}").mkString(" AND ")
    val ins = columns.map(cast).mkString(", ")
    val nonKeys = columns.filterNot(keys.contains)
    val matched =
      if (updateOnMatch && nonKeys.nonEmpty)
        s" WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = ${cast(c)}").mkString(", ")}"
      else ""
    Statement(
      s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 d " +
        s"ON $on WHEN NOT MATCHED THEN INSERT (${columns.mkString(", ")}) VALUES ($ins)" +
        matched,
      keys ++ columns ++ (if (matched.nonEmpty) nonKeys else Nil),
      widths)
  }

  /** Execute `sql` for every row of `df`, batched per partition. Placeholders
    * bind df's columns in order; pass `paramColumns` when the statement
    * references columns in a different order or more than once (MERGE).
    * `varcharWidths` (column → declared width) makes an over-long string
    * fail loudly before binding — the engine-side CAST would truncate it
    * silently otherwise.
    */
  def write(df: DataFrame, jdbcUrl: String, props: java.util.Properties, sql: String,
      batchSize: Int = 1000, paramColumns: Seq[String] = Nil,
      varcharWidths: Map[String, Int] = Map.empty): Unit = {
    val columns = df.columns
    val paramCols = if (paramColumns.isEmpty) columns.toSeq else paramColumns
    val paramIdx  = paramCols.map(c => columns.indexOf(c))
    require(paramIdx.forall(_ >= 0), s"paramColumns must be df columns")
    val widths = paramCols.map(c => varcharWidths.getOrElse(c, -1)).toArray
    val names  = paramCols.toArray
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n  = 0
          rows.foreach { r =>
            paramIdx.zipWithIndex.foreach { case (ci, pi) =>
              r.get(ci) match {
                // Counts Unicode CODE POINTS (not UTF-16 units, which
                // undercount supplementary chars on character-semantics
                // engines). Approximate for byte-width engines (UTF-8
                // multi-byte columns) — widen typeOverrides accordingly.
                case s: String if widths(pi) > 0 &&
                    s.codePointCount(0, s.length) > widths(pi) =>
                  throw new IllegalArgumentException(
                    s"value for column ${names(pi)} is " +
                      s"${s.codePointCount(0, s.length)} code points but the " +
                      s"statement declares VARCHAR(${widths(pi)}) — the cast would " +
                      "silently truncate; widen via mergeSql typeOverrides")
                case v => st.setObject(pi + 1, v)
              }
            }
            st.addBatch()
            n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Convenience: run a generated [[Statement]] against `df`. */
  def write(df: DataFrame, jdbcUrl: String, props: java.util.Properties,
      st: Statement, batchSize: Int): Unit =
    write(df, jdbcUrl, props, st.sql, batchSize, st.paramColumns, st.varcharWidths)

  def write(df: DataFrame, jdbcUrl: String, props: java.util.Properties,
      st: Statement): Unit =
    write(df, jdbcUrl, props, st.sql, 1000, st.paramColumns, st.varcharWidths)
}
