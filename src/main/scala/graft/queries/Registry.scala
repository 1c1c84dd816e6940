package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-visible query: the Spark plan builder plus (optionally) its
  * DuckDB oracle twin. Column names of the Spark result and the oracle must
  * match exactly — the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, contributed per module. */
  def all: Seq[Q] = CoreQueries.qs ++ PipelineQueries.qs ++ ExtQueries.qs ++
    EvalQueries.qs ++ CorpusQueries.qs ++ WarehouseQueries.qs ++ OpsQueries.qs ++
    CurationQueries.qs ++ Round6Queries.qs ++ Round7Queries.qs ++ Round8Queries.qs ++
    Round9Queries.qs ++ Round11Queries.qs ++ Round12Queries.qs ++
    Round13Queries.qs ++ Round14Queries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
