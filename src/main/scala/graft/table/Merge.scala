package graft.table

/** MERGE (upsert) action ADTs. The reference's engine (DataFusion) has no
  * MERGE and its SQL surface rejects DML (`GraftSql` keeps that parity);
  * this is the programmatic upsert a training-data pipeline needs: CDC
  * folds, dedup-and-refresh, incremental corpus updates. */
sealed trait WhenMatched
object WhenMatched {
  /** Replace every column of a matched target row with the source row. */
  case object UpdateAll extends WhenMatched
  /** Set specific columns; expressions see target columns by name and
    * source columns as `__src_<name>` (e.g. "v + __src_v"). */
  final case class UpdateSet(assignments: Map[String, String]) extends WhenMatched
  /** Remove matched target rows. */
  case object Delete extends WhenMatched
  /** Leave matched target rows untouched. */
  case object Ignore extends WhenMatched
}

sealed trait WhenNotMatched
object WhenNotMatched {
  /** Insert source rows with no target match. */
  case object InsertAll extends WhenNotMatched
  /** Drop them. */
  case object Ignore extends WhenNotMatched
}
