package graft.util

import org.apache.spark.sql.SparkSession

/** A session carrying the library's [[graft.GraftExtensions]] (the
  * injected parser, the row-level DML rules, the SQL functions) on a
  * LIVE SparkContext — the runtime route for callers whose session the
  * library didn't build. `spark.sql.extensions` is a STATIC conf read
  * at session construction, so it cannot be set on an existing
  * session; the documented programmatic equivalent is
  * `Builder.withExtensions(new GraftExtensions)`, which this helper
  * applies while sharing the caller's SparkContext (and therefore its
  * executors, caches, and listener bus). Cached per context: repeated
  * calls return the same session. The caller's active/default session
  * registration is restored, so the derived session never leaks into
  * unrelated `SparkSession.active` lookups. */
object ExtSession {

  @volatile private var cached: SparkSession = _

  def apply(base: SparkSession): SparkSession = synchronized {
    val c = cached
    if (c != null && c.sparkContext == base.sparkContext &&
        !c.sparkContext.isStopped) return c
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      cached = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      cached
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
