package graft.exec

import org.apache.spark.sql.SparkSession

/** Session-scoped conflict-key declarations for the generated-DML
  * path. SQLite resolves `INSERT OR REPLACE` / bare `ON CONFLICT`
  * against the target's PRIMARY KEY or any UNIQUE constraint; ingested
  * tables declare none (pandas `to_sql`, reference pandasqlite.py:115)
  * — for those graft keys on the leading column (documented README
  * divergence). But generated SQL can DECLARE keys mid-session
  * (`CREATE TABLE … PRIMARY KEY`, `CREATE UNIQUE INDEX`), and then
  * SQLite's own resolution rule applies — this registry carries those
  * declarations so [[Upsert]] resolves the same way. Column DEFAULTs
  * register here too (partial-column INSERTs fill them, `PRAGMA
  * table_info` reports them).
  *
  * State is keyed by the SparkSession itself in a WEAK map (sessions
  * are the engine's database scope, like the reference's in-memory
  * SQLite db): when a session is garbage-collected its declarations
  * go with it, so a long-lived driver cycling many sessions never
  * accumulates dead registry entries. Entries are also dropped
  * eagerly with their table ([[Ddl.drop]]) or index.
  */
object SessionKeys {

  // origin: 'c' = CREATE INDEX, 'u' = a UNIQUE table constraint's
  // automatic index, SQLite's own PRAGMA index_list codes
  private final case class IndexInfo(table: String, cols: Seq[String],
                                     unique: Boolean, origin: String,
                                     // per-column (descending?, collation)
                                     riders: Seq[(Boolean, String)] = Nil)

  private final class State {
    // lowercased table -> declared PRIMARY KEY
    val pks = scala.collection.mutable.Map.empty[String, Seq[String]]
    // lowercased index name -> index info
    val indexes = scala.collection.mutable.Map.empty[String, IndexInfo]
    // lowercased table -> lowercased column ->
    // (raw DEFAULT text as written, executable Spark-SQL expression)
    val defaults =
      scala.collection.mutable.Map.empty[String, Map[String, (String, String)]]
  }

  // weak keys: a dead session's declarations are collectable; all
  // access goes through state()'s lock plus per-State synchronization
  private val states =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, State]())

  private def state(spark: SparkSession): State =
    states.synchronized {
      var s = states.get(spark)
      if (s == null) { s = new State; states.put(spark, s) }
      s
    }

  /** Declare a table's PRIMARY KEY (CREATE TABLE with a PK/UNIQUE
    * constraint). */
  def declarePk(spark: SparkSession, table: String, cols: Seq[String]): Unit = {
    val s = state(spark)
    s.synchronized { s.pks(table.toLowerCase) = cols }
  }

  /** Register an index. Returns false when the name is taken (SQLite
    * errors unless IF NOT EXISTS). */
  def registerIndex(spark: SparkSession, name: String, table: String,
                    cols: Seq[String], unique: Boolean,
                    origin: String = "c",
                    riders: Seq[(Boolean, String)] = Nil): Boolean = {
    val s = state(spark)
    s.synchronized {
      val n = name.toLowerCase
      if (s.indexes.contains(n)) false
      else {
        s.indexes(n) = IndexInfo(table.toLowerCase, cols, unique, origin,
          riders)
        true
      }
    }
  }

  /** Per-column (descending?, collation) riders of a declared index,
    * padded with the (false, "BINARY") default — feeds
    * `PRAGMA index_xinfo`. */
  def indexRiders(spark: SparkSession, name: String): Seq[(Boolean, String)] = {
    val s = state(spark)
    s.synchronized(s.indexes.get(name.toLowerCase)).map { i =>
      i.cols.indices.map(k =>
        i.riders.lift(k).getOrElse((false, "BINARY")))
    }.getOrElse(Nil)
  }

  /** Drop an index by name. Returns false when absent. */
  def dropIndex(spark: SparkSession, name: String): Boolean = {
    val s = state(spark)
    s.synchronized(s.indexes.remove(name.toLowerCase).isDefined)
  }

  /** Forget everything declared for a table (DROP TABLE/VIEW, or a
    * CREATE re-binding the name). */
  def forgetTable(spark: SparkSession, table: String): Unit = {
    val s = state(spark)
    val t = table.toLowerCase
    s.synchronized {
      s.pks.remove(t)
      s.defaults.remove(t)
      s.indexes.filterInPlace((_, i) => i.table != t)
    }
  }

  /** Declare (merge) column DEFAULTs for a table: column →
    * (raw text as written — `PRAGMA table_info` reports it,
    * executable Spark-SQL expression — partial-column INSERTs fill
    * it, SQLite's rule). */
  def declareDefaults(spark: SparkSession, table: String,
                      ds: Seq[(String, (String, String))]): Unit =
    if (ds.nonEmpty) {
      val s = state(spark)
      val t = table.toLowerCase
      s.synchronized {
        s.defaults(t) = s.defaults.getOrElse(t, Map.empty) ++
          ds.map { case (c, v) => c.toLowerCase -> v }
      }
    }

  /** Declared DEFAULTs by lowercased column name. */
  def defaultsFor(spark: SparkSession, table: String)
      : Map[String, (String, String)] = {
    val s = state(spark)
    s.synchronized(s.defaults.getOrElse(table.toLowerCase, Map.empty))
  }

  /** ALTER TABLE DROP COLUMN: the column's default goes with it. */
  def forgetColumn(spark: SparkSession, table: String, col: String): Unit = {
    val s = state(spark)
    val t = table.toLowerCase
    s.synchronized {
      s.defaults.get(t).foreach(m => s.defaults(t) = m - col.toLowerCase)
    }
  }

  /** ALTER TABLE RENAME TO: declared keys, defaults, and indexes
    * follow the table to its new name (SQLite rewrites schema
    * references on rename). */
  def renameTable(spark: SparkSession, table: String, newName: String): Unit = {
    val s = state(spark)
    val t = table.toLowerCase
    val n = newName.toLowerCase
    s.synchronized {
      s.pks.remove(t).foreach(s.pks(n) = _)
      s.defaults.remove(t).foreach(s.defaults(n) = _)
      s.indexes.mapValuesInPlace((_, i) =>
        if (i.table == t) i.copy(table = n) else i)
    }
  }

  /** ALTER TABLE RENAME COLUMN: declared keys, defaults, and index
    * column lists referencing the column follow (SQLite rewrites them
    * too). */
  def renameColumn(spark: SparkSession, table: String, oldCol: String,
                   newCol: String): Unit = {
    val s = state(spark)
    val t = table.toLowerCase
    def sub(cols: Seq[String]): Seq[String] =
      cols.map(c => if (c.equalsIgnoreCase(oldCol)) newCol else c)
    s.synchronized {
      s.pks.get(t).foreach(k => s.pks(t) = sub(k))
      s.defaults.get(t).foreach { m =>
        m.get(oldCol.toLowerCase).foreach(v =>
          s.defaults(t) = m - oldCol.toLowerCase + (newCol.toLowerCase -> v))
      }
      s.indexes.mapValuesInPlace((_, i) =>
        if (i.table == t) i.copy(cols = sub(i.cols)) else i)
    }
  }

  /** The table's declared PRIMARY KEY alone (for introspection:
    * `PRAGMA table_info`'s pk column reports PK membership, not
    * unique-index keys). */
  def declaredPk(spark: SparkSession, table: String): Option[Seq[String]] = {
    val s = state(spark)
    s.synchronized(s.pks.get(table.toLowerCase))
  }

  /** All indexes declared on a table, name-ordered: (name, columns,
    * unique, origin). Feeds `PRAGMA index_list`. */
  def indexesFor(spark: SparkSession, table: String)
      : Seq[(String, Seq[String], Boolean, String)] = {
    val s = state(spark)
    val t = table.toLowerCase
    s.synchronized {
      s.indexes.toSeq.filter(_._2.table == t).sortBy(_._1)
        .map { case (n, i) => (n, i.cols, i.unique, i.origin) }
    }
  }

  /** Every index declared in the session, name-ordered: (name, table,
    * columns, unique, origin). Feeds the sqlite_master index rows. */
  def allIndexes(spark: SparkSession)
      : Seq[(String, String, Seq[String], Boolean, String)] = {
    val s = state(spark)
    s.synchronized {
      s.indexes.toSeq.sortBy(_._1)
        .map { case (n, i) => (n, i.table, i.cols, i.unique, i.origin) }
    }
  }

  /** Look up one index by name: (table, columns, unique). Feeds
    * `PRAGMA index_info`. */
  def indexByName(spark: SparkSession, name: String)
      : Option[(String, Seq[String], Boolean)] = {
    val s = state(spark)
    s.synchronized(s.indexes.get(name.toLowerCase)
      .map(i => (i.table, i.cols, i.unique)))
  }

  /** The conflict key a bare `INSERT OR REPLACE` / `ON CONFLICT`
    * resolves against: the declared PRIMARY KEY, else the first
    * (name-ordered, for determinism) UNIQUE index on the table, else
    * None (caller falls back to the leading-column convention). */
  def keyFor(spark: SparkSession, table: String): Option[Seq[String]] = {
    val s = state(spark)
    val t = table.toLowerCase
    s.synchronized {
      s.pks.get(t).orElse {
        s.indexes.toSeq.filter(e => e._2.table == t && e._2.unique)
          .sortBy(_._1).headOption.map(_._2.cols)
      }
    }
  }
}
