package graft.exec

import org.apache.spark.sql.SparkSession

/** Which session relation names are VIEWS (CREATE [TEMP] VIEW through
  * the generated-SQL path) — Spark's catalog holds both views and the
  * engine's materialized tables as temporary views, so SQLite's
  * table-vs-view distinctions (DML refusal, DROP TABLE/VIEW keyword
  * matching, ALTER refusal, INSTEAD OF trigger targeting) need the
  * engine's own record. Weakly keyed per session like [[SessionKeys]].
  * Relations registered through the raw Spark API are treated as
  * tables — the same generated-SQL-path scoping as triggers. */
object SessionViews {

  private val states =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.mutable.Set[String]]())

  private def state(spark: SparkSession): scala.collection.mutable.Set[String] =
    states.synchronized {
      var s = states.get(spark)
      if (s == null) {
        s = scala.collection.mutable.Set.empty[String]
        states.put(spark, s)
      }
      s
    }

  def add(spark: SparkSession, name: String): Unit = {
    val s = state(spark); s.synchronized { s += name.toLowerCase; () }
  }

  def remove(spark: SparkSession, name: String): Unit = {
    val s = state(spark); s.synchronized { s -= name.toLowerCase; () }
  }

  def isView(spark: SparkSession, name: String): Boolean = {
    val s = state(spark); s.synchronized(s.contains(name.toLowerCase))
  }
}
