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

/** `WHEN NOT MATCHED BY SOURCE` — the full-sync side of MERGE: what
  * happens to TARGET rows whose key never appears in the source. Its
  * domain is the whole target minus the source key set, so an active
  * clause widens the merge scan to every live file (no source-key-bounds
  * pruning is sound); merge-on-read mode keeps the WRITE cost at
  * O(affected rows) regardless. */
sealed trait WhenNotMatchedBySource
object WhenNotMatchedBySource {
  /** Remove target rows absent from the source (mirror/full-sync). */
  case object Delete extends WhenNotMatchedBySource
  /** Set specific columns on them; expressions see target columns by name
    * (source columns do not exist on these rows). */
  final case class UpdateSet(assignments: Map[String, String]) extends WhenNotMatchedBySource
  /** Leave them untouched (the default — classic upsert). */
  case object Ignore extends WhenNotMatchedBySource
}
