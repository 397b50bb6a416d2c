package graft.functions

import org.apache.spark.sql.Column

/** fnmatch-style name patterns → SQL LIKE (SURVEY §2.3 F5/F6;
  * reference: database/__init__.py:1710–1786 `find`,
  * fitting/controller.py:228–243 filter gates).
  *
  * The reference resolves `group.dbname[.seed][.params]` patterns with
  * Python fnmatch over an in-memory catalog; the Spark-native catalog
  * is a DataFrame, so patterns compile to LIKE predicates that push
  * down to the metadata scan.
  */
object Fnmatch {
  /** `*` → `%`, `?` → `_`; literal `%`/`_` escaped with `\`. */
  def toLike(pattern: String): String =
    pattern.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  def matches(c: Column, pattern: String): Column = c.like(toLike(pattern))
}
