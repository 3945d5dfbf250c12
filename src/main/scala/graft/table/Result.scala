package graft.table

/** Row-oriented query result (ref `lib/iceberg/result.rb:2-21`,
  * `ext/iceberg/src/result.rs:18-68`): ordered column names + rows, and an
  * Iterable of column→value maps for `to_a` parity. */
final case class Result(columns: Seq[String], rows: Seq[Seq[Any]])
    extends Iterable[Map[String, Any]] {
  def iterator: Iterator[Map[String, Any]] =
    rows.iterator.map(r => columns.zip(r).toMap)
  /** `table.to_a` analogue (ref `lib/iceberg/table.rb:147-149`). */
  def toA: Seq[Map[String, Any]] = iterator.toList
}
