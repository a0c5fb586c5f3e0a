package graft.exec

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Session-scoped conflict-key declarations for the generated-DML
  * path. SQLite resolves `INSERT OR REPLACE` / bare `ON CONFLICT`
  * against the target's PRIMARY KEY or any UNIQUE constraint; ingested
  * tables declare none (pandas `to_sql`, reference pandasqlite.py:115)
  * — for those graft keys on the leading column (documented README
  * divergence). But generated SQL can DECLARE keys mid-session
  * (`CREATE TABLE … PRIMARY KEY`, `CREATE UNIQUE INDEX`), and then
  * SQLite's own resolution rule applies — this registry carries those
  * declarations so [[Upsert]] resolves the same way.
  *
  * Keyed per SparkSession identity (sessions are the engine's
  * database scope, like the reference's in-memory SQLite db); entries
  * are dropped with their table ([[Ddl.drop]]) or index.
  */
object SessionKeys {

  private final case class IndexInfo(table: String, cols: Seq[String],
                                     unique: Boolean)

  // (session identity, lowercased table) -> declared PRIMARY KEY
  private val pks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[String]]()
  // (session identity, lowercased index name) -> index info
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[(String, String), IndexInfo]()
  // (session identity, lowercased table) -> lowercased column ->
  // (raw DEFAULT text as written, executable Spark-SQL expression)
  private val defaults =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      Map[String, (String, String)]]()

  private def sid(spark: SparkSession): String =
    System.identityHashCode(spark).toString

  /** Declare a table's PRIMARY KEY (CREATE TABLE with a PK/UNIQUE
    * constraint). */
  def declarePk(spark: SparkSession, table: String, cols: Seq[String]): Unit =
    pks.put((sid(spark), table.toLowerCase), cols)

  /** Register an index. Returns false when the name is taken (SQLite
    * errors unless IF NOT EXISTS). */
  def registerIndex(spark: SparkSession, name: String, table: String,
                    cols: Seq[String], unique: Boolean): Boolean =
    indexes.putIfAbsent((sid(spark), name.toLowerCase),
      IndexInfo(table.toLowerCase, cols, unique)) == null

  /** Drop an index by name. Returns false when absent. */
  def dropIndex(spark: SparkSession, name: String): Boolean =
    indexes.remove((sid(spark), name.toLowerCase)) != null

  /** Forget everything declared for a table (DROP TABLE/VIEW, or a
    * CREATE re-binding the name). */
  def forgetTable(spark: SparkSession, table: String): Unit = {
    val s = sid(spark)
    val t = table.toLowerCase
    pks.remove((s, t))
    defaults.remove((s, t))
    indexes.entrySet().asScala
      .filter(e => e.getKey._1 == s && e.getValue.table == t)
      .map(_.getKey).toList.foreach(indexes.remove)
  }

  /** Declare (merge) column DEFAULTs for a table: column →
    * (raw text as written — `PRAGMA table_info` reports it,
    * executable Spark-SQL expression — partial-column INSERTs fill
    * it, SQLite's rule). */
  def declareDefaults(spark: SparkSession, table: String,
                      ds: Seq[(String, (String, String))]): Unit =
    if (ds.nonEmpty)
      defaults.merge((sid(spark), table.toLowerCase),
        ds.map { case (c, v) => c.toLowerCase -> v }.toMap, _ ++ _)

  /** Declared DEFAULTs by lowercased column name. */
  def defaultsFor(spark: SparkSession, table: String)
      : Map[String, (String, String)] =
    Option(defaults.get((sid(spark), table.toLowerCase)))
      .getOrElse(Map.empty)

  /** ALTER TABLE DROP COLUMN: the column's default goes with it. */
  def forgetColumn(spark: SparkSession, table: String, col: String): Unit = {
    val k = (sid(spark), table.toLowerCase)
    Option(defaults.get(k)).foreach(m =>
      defaults.put(k, m - col.toLowerCase))
  }

  /** ALTER TABLE RENAME TO: declared keys and indexes follow the table
    * to its new name (SQLite rewrites schema references on rename). */
  def renameTable(spark: SparkSession, table: String, newName: String): Unit = {
    val s = sid(spark)
    val t = table.toLowerCase
    Option(pks.remove((s, t))).foreach(pks.put((s, newName.toLowerCase), _))
    Option(defaults.remove((s, t)))
      .foreach(defaults.put((s, newName.toLowerCase), _))
    indexes.entrySet().asScala
      .filter(e => e.getKey._1 == s && e.getValue.table == t)
      .toList.foreach(e =>
        indexes.put(e.getKey, e.getValue.copy(table = newName.toLowerCase)))
  }

  /** ALTER TABLE RENAME COLUMN: declared keys and index column lists
    * referencing the column follow (SQLite rewrites them too). */
  def renameColumn(spark: SparkSession, table: String, oldCol: String,
                   newCol: String): Unit = {
    val s = sid(spark)
    val t = table.toLowerCase
    def sub(cols: Seq[String]): Seq[String] =
      cols.map(c => if (c.equalsIgnoreCase(oldCol)) newCol else c)
    Option(pks.get((s, t))).foreach(k => pks.put((s, t), sub(k)))
    Option(defaults.get((s, t))).foreach { m =>
      m.get(oldCol.toLowerCase).foreach(v =>
        defaults.put((s, t), m - oldCol.toLowerCase + (newCol.toLowerCase -> v)))
    }
    indexes.entrySet().asScala
      .filter(e => e.getKey._1 == s && e.getValue.table == t)
      .toList.foreach(e =>
        indexes.put(e.getKey, e.getValue.copy(cols = sub(e.getValue.cols))))
  }

  /** The table's declared PRIMARY KEY alone (for introspection:
    * `PRAGMA table_info`'s pk column reports PK membership, not
    * unique-index keys). */
  def declaredPk(spark: SparkSession, table: String): Option[Seq[String]] =
    Option(pks.get((sid(spark), table.toLowerCase)))

  /** All indexes declared on a table, name-ordered: (name, columns,
    * unique). Feeds `PRAGMA index_list`. */
  def indexesFor(spark: SparkSession, table: String)
      : Seq[(String, Seq[String], Boolean)] = {
    val s = sid(spark)
    val t = table.toLowerCase
    indexes.entrySet().asScala
      .filter(e => e.getKey._1 == s && e.getValue.table == t)
      .toSeq.sortBy(_.getKey._2)
      .map(e => (e.getKey._2, e.getValue.cols, e.getValue.unique))
  }

  /** Every index declared in the session, name-ordered: (name, table,
    * columns, unique). Feeds the sqlite_master index rows. */
  def allIndexes(spark: SparkSession)
      : Seq[(String, String, Seq[String], Boolean)] = {
    val s = sid(spark)
    indexes.entrySet().asScala.filter(_.getKey._1 == s)
      .toSeq.sortBy(_.getKey._2)
      .map(e => (e.getKey._2, e.getValue.table, e.getValue.cols,
        e.getValue.unique))
  }

  /** Look up one index by name: (table, columns, unique). Feeds
    * `PRAGMA index_info`. */
  def indexByName(spark: SparkSession, name: String)
      : Option[(String, Seq[String], Boolean)] =
    Option(indexes.get((sid(spark), name.toLowerCase)))
      .map(i => (i.table, i.cols, i.unique))

  /** The conflict key a bare `INSERT OR REPLACE` / `ON CONFLICT`
    * resolves against: the declared PRIMARY KEY, else the first
    * (name-ordered, for determinism) UNIQUE index on the table, else
    * None (caller falls back to the leading-column convention). */
  def keyFor(spark: SparkSession, table: String): Option[Seq[String]] = {
    val s = sid(spark)
    val t = table.toLowerCase
    Option(pks.get((s, t))).orElse {
      indexes.entrySet().asScala
        .filter(e => e.getKey._1 == s && e.getValue.table == t &&
          e.getValue.unique)
        .toSeq.sortBy(_.getKey._2).headOption.map(_.getValue.cols)
    }
  }
}
