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

  /** Execute `sql` for every row of `df`, batched per partition. */
  def write(df: DataFrame, jdbcUrl: String, props: java.util.Properties, sql: String,
      batchSize: Int = 1000): Unit = {
    val columns = df.columns
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(jdbcUrl, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n  = 0
          rows.foreach { r =>
            columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
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
}
