package graft.tools

import graft.GraftSession

/** Scratch probe: does Spark's SQL front end accept a given statement?
  * Used to pre-flight SQL-matrix shapes (OR-correlated EXISTS, named
  * WINDOW clause, ...) before wiring them into oracle-gated entries.
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.nation(spark, "/root/testdata/sf0.01")
      .createOrReplaceTempView("v_nation")
    graft.sources.Tables.supplier(spark, "/root/testdata/sf0.01")
      .createOrReplaceTempView("v_supplier")
    val stmts = Seq(
      "or_exists" -> """
        WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS a1,
                          CAST(n_regionkey AS BIGINT) AS a2 FROM v_nation),
             b AS (SELECT CAST(s_nationkey AS BIGINT) AS b1, s_acctbal AS b3
                   FROM v_supplier)
        SELECT a1 FROM a
        WHERE EXISTS (SELECT 1 FROM b WHERE b1 = a2 OR b3 > 9000)
        ORDER BY a1""",
      "window_clause" -> """
        SELECT n_regionkey, n_nationkey,
          CAST(row_number() OVER w AS BIGINT) AS rn,
          count(*) OVER w2 AS c
        FROM v_nation
        WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey),
               w2 AS (PARTITION BY n_regionkey)
        ORDER BY n_nationkey""",
      "in_select_1" -> """
        SELECT n_nationkey FROM v_nation WHERE n_nationkey IN (SELECT 1)
        ORDER BY n_nationkey""",
      "scalar_derived" -> """
        SELECT 1 AS a, (SELECT 2 + b1) AS b FROM (SELECT 1 AS b1)""",
      "join_no_on" -> "SELECT count(*) FROM v_nation JOIN v_supplier",
      "left_join_no_on" -> "SELECT count(*) FROM v_nation LEFT JOIN v_supplier",
      "negative_interval" -> """
        SELECT date_format(TIMESTAMP '2000-06-15 12:00:00'
          + INTERVAL -2 YEAR, 'yyyy-MM-dd HH:mm:ss') AS t""",
      "minute_second" -> """
        SELECT date_format(TIMESTAMP '2000-06-15 12:00:00'
          + INTERVAL 90 MINUTE - INTERVAL 30 SECOND,
          'yyyy-MM-dd HH:mm:ss') AS t""")
    stmts.foreach { case (name, sql) =>
      try {
        val n = spark.sql(sql).count()
        println(s"[probe] $name OK ($n rows)")
      } catch {
        case e: Throwable =>
          println(s"[probe] $name FAIL ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.take(2).mkString(" | "))
      }
    }
    spark.stop()
  }
}
