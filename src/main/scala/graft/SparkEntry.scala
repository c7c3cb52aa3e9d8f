package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (one entry per
  * SURVEY.md §2 operator / §2.6 category); `oracleSql` gives the DuckDB
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.sql.RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.sql.RelationalQueries.queries ++
      graft.sql.MiningQueries.queries ++
      graft.sql.RobustStatsQueries.queries ++
      graft.sql.TimeSeriesQueries.queries ++
      graft.sql.SurvivalQueries.queries ++
      graft.text.TextQueries.queries ++
      graft.text.CurationQueries.queries ++
      graft.text.SearchQueries.queries ++
      graft.text.BpeQueries.queries ++
      graft.dedup.DedupQueries.queries ++
      graft.sim.SimilarityQueries.queries ++
      graft.sim.SpectralQueries.queries ++
      graft.sim.MlQueries.queries ++
      graft.tar.PackageQueries.queries ++
      graft.sources.SourceQueries.queries ++
      graft.ingest.Messages.queries ++
      graft.ingest.Resolution.queries ++
      graft.ingest.IngestQueries.queries ++
      graft.store.UpsertQueries.queries ++
      graft.store.PublishQueries.queries ++
      graft.media.MediaQueries.queries ++
      graft.sketch.SketchQueries.queries ++
      graft.graph.GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.sql.RelationalQueries.oracleSql ++
      graft.sql.MiningQueries.oracleSql ++
      graft.sql.RobustStatsQueries.oracleSql ++
      graft.sql.TimeSeriesQueries.oracleSql ++
      graft.sql.SurvivalQueries.oracleSql ++
      graft.text.TextQueries.oracleSql ++
      graft.text.CurationQueries.oracleSql ++
      graft.text.SearchQueries.oracleSql ++
      graft.text.BpeQueries.oracleSql ++
      graft.dedup.DedupQueries.oracleSql ++
      graft.sim.SimilarityQueries.oracleSql ++
      graft.sim.SpectralQueries.oracleSql ++
      graft.sim.MlQueries.oracleSql ++
      graft.tar.PackageQueries.oracleSql ++
      graft.sources.SourceQueries.oracleSql ++
      graft.ingest.Messages.oracleSql ++
      graft.ingest.Resolution.oracleSql ++
      graft.ingest.IngestQueries.oracleSql ++
      graft.store.UpsertQueries.oracleSql ++
      graft.store.PublishQueries.oracleSql ++
      graft.media.MediaQueries.oracleSql ++
      graft.sketch.SketchQueries.oracleSql ++
      graft.graph.GraphQueries.oracleSql
}
