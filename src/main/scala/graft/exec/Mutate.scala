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
    // UPDATE OR <action> differs from plain UPDATE only on a
    // constraint violation; a table with no declared constraints can't
    // raise one, so the statement IS a plain UPDATE there (exactly
    // SQLite — same reasoning as INSERT OR ABORT/FAIL/ROLLBACK). With
    // a session-declared key the rewrite would have to simulate
    // constraint checking — targeted decline instead.
    u.orAction.foreach { a =>
      if (SessionKeys.keyFor(spark, u.table).isDefined)
        throw new UnsupportedOperationException(
          s"UPDATE OR $a on a table with a declared unique key is not " +
            s"supported (the copy-on-write rewrite does not simulate " +
            s"constraint checking); use a plain UPDATE")
    }
    if (u.from.isDefined) return runUpdateFrom(spark, u)
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

  /** SQLite's UPDATE-FROM join form (lang_update.html §2): each target
    * row joins the FROM sources under WHERE; matched rows take the
    * assignments (expressions see the joined row), unmatched rows stay.
    * SQLite uses "one arbitrarily chosen" join row when several match a
    * target row — here the choice is the DETERMINISTIC minimum of the
    * assigned row image (`min(named_struct(…))`), a valid instance of
    * "arbitrary" that keeps reruns and the oracle stable.
    *
    * Shape: the base gains a monotonic row id (persisted so both the
    * matched and untouched branches read one consistent id assignment),
    * the join+pick aggregates per id — one shuffle on the join, one on
    * the group — and the rewrite is `(base ⟕anti matched) ∪ matched`.
    * At 100 TB this is the standard enrichment-merge shape; no row
    * crosses the driver.
    */
  private def runUpdateFrom(spark: SparkSession, u: SqlDml.Update): DataFrame = {
    import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
    val base = resolve(spark, u.table, "UPDATE")
    val known = base.schema.fields.map(_.name.toLowerCase).toSet
    val unknown = u.assigns.map(_._1).filterNot(c => known(c.toLowerCase))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"UPDATE ${u.table}: no such column(s) ${unknown.mkString(", ")}")
    val assigns = u.assigns.map { case (c, e) => c.toLowerCase -> e }.toMap
    val gen = Upsert.nextGeneration()
    val rid = "__graft_rid"
    val baseR = base.withColumn(rid, monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bview = s"graft_updf_src_g$gen"
    baseR.createOrReplaceTempView(bview)
    try {
      // alias the rid-tagged base AS the target table name so both
      // bare and `table.col`-qualified references resolve against it
      // (the original view stays registered — a self-reference in the
      // FROM list reads the old state, as SQLite's does)
      val alias = q(u.table)
      val cond = u.where.map(w => s"coalesce(($w), false)").getOrElse("true")
      val pickFields = base.schema.fields.map { f =>
        val v = assigns.get(f.name.toLowerCase) match {
          case Some(e) => s"CAST(($e) AS ${f.dataType.sql})"
          case None    => s"$alias.${q(f.name)}"
        }
        s"'${f.name.replace("'", "''")}', $v"
      }.mkString(", ")
      val matched = spark.sql(
        s"""${u.withPrefix}
           |SELECT __rid, __pick.* FROM (
           |  SELECT $alias.`$rid` AS __rid,
           |         min(named_struct($pickFields)) AS __pick
           |  FROM `$bview` AS $alias, ${u.from.get}
           |  WHERE $cond
           |  GROUP BY $alias.`$rid`
           |)""".stripMargin.trim)
      val untouched = baseR
        .join(matched.select(col("__rid").as(rid)), Seq(rid), "left_anti")
        .drop(rid)
      val merged = untouched.unionByName(matched.drop("__rid"))
      val ret = u.returning.map { r =>
        val rv = s"graft_updf_ret_g$gen"
        matched.drop("__rid").createOrReplaceTempView(rv)
        try spark.sql(s"${u.withPrefix} SELECT $r FROM `$rv`".trim)
        finally () // view dropped after rebind materializes it
      }
      val out = rebind(spark, u.table, merged, ret)
      spark.catalog.dropTempView(s"graft_updf_ret_g$gen")
      out
    } finally {
      spark.catalog.dropTempView(bview)
      baseR.unpersist()
    }
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
