package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator families contribute (name, fn, oracle) triples. */
  private def allEntries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    graft.operators.Relational.entries ++
      graft.operators.SqlMatrix.entries ++
      graft.operators.Dedup.entries ++
      graft.operators.Similarity.entries ++
      graft.operators.TextOps.entries ++
      graft.operators.Pack.entries ++
      graft.operators.Pipeline.entries ++
      graft.operators.Multimodal.entries ++
      graft.operators.Sessionize.entries ++
      graft.operators.AsOf.entries ++
      graft.operators.TopK.entries ++
      graft.operators.Skyline.entries ++
      graft.operators.RangeJoin.entries ++
      graft.operators.Graph.entries ++
      graft.operators.Timeseries.entries ++
      graft.operators.Quality.entries ++
      graft.operators.Warehouse.entries ++
      graft.operators.Basket.entries ++
      graft.operators.Er.entries ++
      graft.operators.Search.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.collect { case (n, _, Some(sql)) => n -> sql.trim }.toMap
}
