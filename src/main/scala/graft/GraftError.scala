package graft

/** Error hierarchy matching the reference's API contract
  * (`lib/iceberg.rb:30-42`, SURVEY.md §2.10). Tests assert exact classes. */
class GraftError(msg: String) extends RuntimeException(msg)

class InvalidDataError(msg: String) extends GraftError(msg)
class NamespaceAlreadyExistsError(msg: String) extends GraftError(msg)
class NoSuchNamespaceError(msg: String) extends GraftError(msg)
class NoSuchTableError(msg: String) extends GraftError(msg)
class TableAlreadyExistsError(msg: String) extends GraftError(msg)
class UnsupportedFeatureError(msg: String) extends GraftError(msg)
class CommitConflictError(msg: String) extends GraftError(msg)
class Todo(msg: String = "not yet implemented") extends GraftError(msg)
