package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text2sql.SqlDml

/** SQLite `UPDATE` / `DELETE` semantics over immutable lake storage:
  * copy-on-write row rewrites (reference pandasqlite/pandasqlite.py:
  * 245-247 hands any generated statement to SQLite, so both verbs are
  * part of the delegated surface).
  *
  *   UPDATE t SET c = e WHERE p   →  SELECT CASE WHEN p' THEN e' ELSE c
  *                                   END AS c, <other cols> FROM t
  *   DELETE FROM t WHERE p        →  SELECT * FROM t WHERE NOT p'
  *
  * where p' = `coalesce((p), false)` — SQLite updates/deletes exactly
  * the rows whose predicate is TRUE; NULL-predicate rows are kept
  * untouched, which a bare `NOT p` would get wrong. Assignment
  * expressions all see the OLD row (SQLite lang_update.html — the
  * CASE-WHEN projection reads only base columns, so this holds by
  * construction) and are cast to the lake column's type, NULL on a
  * lenient-cast miss per the engine's documented CAST policy.
  *
  * The rewritten table is MATERIALIZED (parquet, fresh generation dir —
  * see [[Upsert]]) and the temp view re-bound: the statement's
  * observable effect is the same table-state transition SQLite performs
  * in place. At 100 TB both shapes are embarrassingly parallel — a
  * single narrow scan-project(-filter)-write pass, no shuffle, no
  * driver data path; only the files of the new snapshot are written.
  *
  * `RETURNING` evaluates over the affected slice (old rows for DELETE,
  * post-assignment rows for UPDATE, as SQLite defines) and is
  * materialized BEFORE the view re-binds so the handed-back result
  * cannot be perturbed by later statements.
  */
object Mutate {

  private def q(name: String) = "`" + name.replace("`", "``") + "`"

  private def resolve(spark: SparkSession, table: String,
                      verb: String): DataFrame =
    try spark.table(q(table))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$verb target '$table' is not a registered table/view: " +
          e.getMessage, e)
    }

  def runUpdate(spark: SparkSession, u: SqlDml.Update): DataFrame = {
    val base = resolve(spark, u.table, "UPDATE")
    val known = base.schema.fields.map(_.name.toLowerCase).toSet
    val unknown = u.assigns.map(_._1).filterNot(c => known(c.toLowerCase))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"UPDATE ${u.table}: no such column(s) ${unknown.mkString(", ")}")
    // rightmost assignment wins on a repeated column (SQLite rule);
    // toMap keeps the last entry per key
    val assigns = u.assigns.map { case (c, e) => c.toLowerCase -> e }.toMap
    val cond = u.where.map(w => s"coalesce(($w), false)").getOrElse("true")
    val proj = base.schema.fields.map { f =>
      assigns.get(f.name.toLowerCase) match {
        case Some(e) =>
          s"CASE WHEN $cond THEN CAST(($e) AS ${f.dataType.sql}) " +
            s"ELSE ${q(f.name)} END AS ${q(f.name)}"
        case None => q(f.name)
      }
    }
    val merged = spark.sql(
      s"${u.withPrefix} SELECT ${proj.mkString(", ")} FROM ${q(u.table)}".trim)
    val ret = u.returning.map { r =>
      // RETURNING sees the NEW row values, affected rows only
      spark.sql((s"${u.withPrefix} SELECT $r FROM " +
        s"(SELECT ${proj.mkString(", ")} FROM ${q(u.table)} " +
        s"WHERE $cond)").trim)
    }
    rebind(spark, u.table, merged, ret)
  }

  def runDelete(spark: SparkSession, d: SqlDml.Delete): DataFrame = {
    resolve(spark, d.table, "DELETE") // existence check, targeted error
    val cond = d.where.map(w => s"coalesce(($w), false)").getOrElse("true")
    val merged = spark.sql(
      s"${d.withPrefix} SELECT * FROM ${q(d.table)} WHERE NOT ($cond)".trim)
    val ret = d.returning.map { r =>
      // RETURNING sees the deleted (old) rows
      spark.sql((s"${d.withPrefix} SELECT $r FROM " +
        s"(SELECT * FROM ${q(d.table)} WHERE $cond)").trim)
    }
    rebind(spark, d.table, merged, ret)
  }

  /** Materialize the rewritten table (and the RETURNING slice, if any
    * — FIRST, while it still reads the old binding), re-bind the view,
    * return RETURNING rows or the new table state. */
  private def rebind(spark: SparkSession, table: String,
                     merged: DataFrame, ret: Option[DataFrame]): DataFrame = {
    val dir = "target/graft_tmp/mutate_" +
      table.replaceAll("[^A-Za-z0-9_]", "_") + "_g" + Upsert.nextGeneration()
    val retOut = ret.map { r =>
      r.write.mode("overwrite").parquet(dir + "_ret")
      spark.read.parquet(dir + "_ret")
    }
    merged.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
    out.createOrReplaceTempView(table)
    retOut.getOrElse(out)
  }
}
