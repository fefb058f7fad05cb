package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query.
  *
  * @param name   stable key, used by the driver's correctness + bench harness
  * @param build  (session, sfDir) => result plan; sfDir holds the parquet
  *               tables described in TESTDATA.md
  * @param oracle equivalent DuckDB SQL over the same tables (None => the
  *               driver falls back to a rows-only check)
  *
  * Determinism contract: every query ends in an ORDER BY over a unique key
  * so Spark and DuckDB produce identical row order, and every floating
  * aggregate is either exact (decimal-summed, see [[graft.functions.Num]])
  * or rounded on BOTH sides.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Single source of truth for the engine's query surface (SURVEY.md §2). */
object Registry {
  lazy val all: Seq[Q] =
    queries.DocQueries.qs ++
      queries.TextQueries.qs ++
      queries.EventQueries.qs ++
      queries.StarQueries.qs ++
      queries.TpchQueries.qs ++
      queries.EmbQueries.qs ++
      queries.DedupQueries.qs ++
      queries.MlQueries.qs ++
      queries.FormatQueries.qs

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
