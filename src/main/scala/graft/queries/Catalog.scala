package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gradable query: a Spark implementation plus (where SQL can
  * express it) a DuckDB oracle over the same parquet tables. Queries with
  * `oracle = None` get the driver's weaker rows-only check and are instead
  * covered by ScalaTest specs.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Catalog {
  /** All query groups, merged for SparkEntry. Names must be unique. */
  def all: Seq[Q] =
    Relational.qs ++ StatsQueries.qs ++ SamplingQueries.qs ++
      TextQueries.qs ++ AnnQueries.qs ++ DedupQueries.qs ++
      MiscQueries.qs ++ BehaviorQueries.qs ++ GraphQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q.run).toMap
  }

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
