package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The one extensions bundle every entry point installs (GraftSession,
  * Verify, Bench): custom optimizer rules + the SQL DDL surface. Usable
  * directly as `spark.sql.extensions=graft.GraftExtensions` on a real
  * cluster, or via `.withExtensions(GraftExtensions)` locally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftExtensions(e)
}

object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.ReduceElisionRule)
    e.injectParser((session, delegate) => new graft.sql.GraftSqlParser(session, delegate))
  }
}
