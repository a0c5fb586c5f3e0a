package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** NOT NULL and CHECK constraint enforcement for session-declared
  * tables, with SQLite's measured semantics (sqlite3 3.40+):
  *
  *  - `NOT NULL constraint failed: t.c` — checked for every NOT NULL
  *    column (declaration order) BEFORE any CHECK, even when the CHECK
  *    references an earlier column;
  *  - `CHECK constraint failed: <name>` for a `CONSTRAINT <name>
  *    CHECK`, `CHECK constraint failed: <expr as written>` for an
  *    unnamed one — constraints checked in declaration order; a CHECK
  *    passes when its expression is TRUE **or NULL** (only FALSE
  *    fails);
  *  - `INSERT OR IGNORE` / `UPDATE OR IGNORE` SKIP violating rows
  *    instead of erroring; explicit `ON CONFLICT DO NOTHING` does NOT
  *    (it covers uniqueness conflicts only — a CHECK violation still
  *    aborts);
  *  - the REPLACE algorithm substitutes a NOT NULL column's declared
  *    DEFAULT for an incoming NULL (aborts when no default exists);
  *  - a WITHOUT ROWID PRIMARY KEY is implicitly NOT NULL (registered
  *    as such — `PRAGMA table_info` reports it, as SQLite's does).
  *
  * Enforcement is a row-local codegen'd conditional folded into the
  * statement's existing write pass (the same shape as [[Strict]]'s
  * type gate): zero extra jobs, no shuffle, no driver path — the
  * violating row raises through `raise_error` during the
  * materializing write and statement-level atomicity ([[Atomic]])
  * rolls the write back. Ingested lake tables declare no constraints,
  * so the 100 TB path pays nothing.
  *
  * Divergence (visible in the error, not the values): SQLite reports
  * the violation of the FIRST violating row in rowid order; a
  * distributed write surfaces an arbitrary violating row's error. The
  * per-row constraint ORDER (NOT NULLs by column order, then CHECKs
  * by declaration) is SQLite's.
  */
object Constraints {

  /** True when the table declares any NOT NULL or CHECK constraint. */
  def has(spark: SparkSession, table: String): Boolean =
    SessionKeys.notNullsFor(spark, table).nonEmpty ||
      SessionKeys.checksFor(spark, table).nonEmpty

  /** (violation condition, error message) pairs over a full-width row
    * frame, in SQLite's evaluation order. The CHECK condition is
    * null-safe: NULL passes (coalesce TRUE), so only an explicit FALSE
    * raises — SQLite's rule. */
  private def violations(spark: SparkSession, table: String)
      : Seq[(Column, String)] = {
    val nn = SessionKeys.notNullsFor(spark, table).map { c =>
      col(Ddl.quote(c)).isNull -> s"NOT NULL constraint failed: $table.$c"
    }
    val cks = SessionKeys.checksFor(spark, table).map {
      case (name, raw, execSql) =>
        val label = if (name.nonEmpty) name else raw
        (!coalesce(expr(execSql).cast(BooleanType), lit(true))) ->
          s"CHECK constraint failed: $label"
    }
    nn ++ cks
  }

  /** Wrap the frame so any violating row raises SQLite's error during
    * the write that materializes it. The chained conditional rides the
    * first column (same pattern as [[Strict.cast]]); rows already in
    * the table always passed at their own write, so evaluating over
    * the merged frame is identity for them. */
  def guard(spark: SparkSession, table: String, df: DataFrame): DataFrame = {
    val vs = violations(spark, table)
    if (vs.isEmpty) df
    else {
      val f0 = df.schema.fields.head
      val guarded = vs.foldRight(col(Ddl.quote(f0.name))) {
        case ((cond, msg), acc) =>
          when(cond, raise_error(lit(msg)).cast(f0.dataType)).otherwise(acc)
      }
      df.withColumn(f0.name, guarded)
    }
  }

  /** The OR IGNORE skip: drop rows violating any NOT NULL / CHECK
    * (measured: `INSERT OR IGNORE` inserts the conforming rows and
    * silently skips the violating ones). */
  def filterViolating(spark: SparkSession, table: String,
                      df: DataFrame): DataFrame = {
    val vs = violations(spark, table)
    if (vs.isEmpty) df
    else df.filter(!vs.map(_._1).reduce(_ || _))
  }

  /** The SQL predicate "this row still satisfies every NOT NULL /
    * CHECK constraint AFTER the assignments apply" — evaluated over
    * the OLD row (assignment expressions read it, so substituting
    * each assigned column reference with its expression is exact).
    * Drives `UPDATE OR IGNORE`'s skip: violating rows keep their old
    * values, exactly SQLite's measured outcome. Callers gate on
    * [[has]], so the conjunction is never empty. */
  def passesAfterAssignSql(spark: SparkSession, table: String,
                           assigns: Map[String, String]): String = {
    def newExpr(c: String): String =
      assigns.get(c.toLowerCase).map(e => s"($e)").getOrElse(Ddl.quote(c))
    val nn = SessionKeys.notNullsFor(spark, table)
      .map(c => s"(${newExpr(c)} IS NOT NULL)")
    val cks = SessionKeys.checksFor(spark, table).map { case (_, _, ex) =>
      s"(coalesce(CAST((${substituteCols(ex, assigns)}) AS BOOLEAN), true))"
    }
    (nn ++ cks).mkString(" AND ")
  }

  /** Word-boundary substitution of assigned column references inside
    * a constraint expression (quote-aware; a name inside a string
    * literal or quoted identifier is untouched; a function call —
    * word followed by '(' — is never a column reference). */
  private def substituteCols(sql: String,
                             assigns: Map[String, String]): String = {
    import graft.text2sql.SqlDialect.{endOfQuoted, isWordChar}
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val e = endOfQuoted(sql, i, c)
        out.append(sql, i, e); i = e
      } else if (isWordChar(c)) {
        var e = i
        while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
        val w = sql.substring(i, e)
        var k = e
        while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
        val isCall = k < sql.length && sql.charAt(k) == '('
        assigns.get(w.toLowerCase) match {
          case Some(ex) if !isCall => out.append('(').append(ex).append(')')
          case _ => out.append(w)
        }
        i = e
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One declared unique key: `exprs` are executable Spark-SQL item
    * texts — a plain column key carries its backtick-quoted names, an
    * expression index its translated expressions; `label` is the text
    * SQLite's UNIQUE error names (`t.c1, t.c2` for column keys,
    * `index 'name'` for expression keys — both measured). A PARTIAL
    * index carries its executable predicate in `where`: uniqueness
    * applies only among predicate-TRUE rows (measured — exempt rows
    * neither conflict nor displace). */
  final case class UniqueKey(label: String, exprs: Seq[String],
                             where: Option[String] = None)

  /** A column-list key in [[UniqueKey]] form (BINARY comparison). */
  def plainKey(table: String, cols: Seq[String]): UniqueKey =
    UniqueKey(cols.map(c => s"$table.$c").mkString(", "),
      cols.map(Ddl.quote))

  /** The comparison fold of a built-in collation (the same two folds
    * the query-route comparison path uses); None = BINARY / unknown. */
  private def collationFold(coll: String): Option[String] =
    coll.toUpperCase match {
      case "NOCASE" => Some("lower")
      case "RTRIM"  => Some("rtrim")
      case _        => None
    }

  /** A column-list key compared under each column's EFFECTIVE
    * collation — SQLite enforces UNIQUE/PK under the column's
    * collating sequence (a NOCASE unique column collides
    * case-insensitively, measured), with an index rider (`CREATE
    * UNIQUE INDEX … (c COLLATE NOCASE)`) overriding the column's
    * declared one. The key expressions take the same lower()/rtrim()
    * folds the comparison path uses; the error label keeps SQLite's
    * column naming. */
  def collatedKey(spark: SparkSession, table: String, cols: Seq[String],
                  riders: Seq[String] = Nil): UniqueKey = {
    val declared = SessionKeys.collatesFor(spark, table)
    val exprs = cols.zipWithIndex.map { case (c, i) =>
      val eff = riders.lift(i).filter(_.nonEmpty)
        .orElse(declared.get(c.toLowerCase))
      eff.flatMap(collationFold) match {
        case Some(fn) => s"$fn(${Ddl.quote(c)})"
        case None     => Ddl.quote(c)
      }
    }
    UniqueKey(cols.map(c => s"$table.$c").mkString(", "), exprs)
  }

  /** The table's declared unique keys, resolved against the current
    * schema: the PRIMARY KEY, every column-list unique index, and
    * every expression-keyed unique index ([[SessionKeys]]) — each
    * column compared under its effective collation. Empty for
    * ingested tables (pandas `to_sql` declares no constraints — the
    * 100 TB path pays nothing anywhere below). */
  def uniqueKeys(spark: SparkSession, table: String,
                 tableCols: Seq[String]): Seq[UniqueKey] = {
    val pkKeys = SessionKeys.declaredPk(spark, table).toSeq
      .flatMap { ks =>
        val resolved = ks.map(k => tableCols.find(_.equalsIgnoreCase(k)))
        if (resolved.forall(_.isDefined)) Some(resolved.flatten) else None
      }
      .map(cols => collatedKey(spark, table, cols))
    val colKeys = SessionKeys.uniqueColIndexes(spark, table)
      .flatMap { case (name, ks, w) =>
        val resolved = ks.map(k => tableCols.find(_.equalsIgnoreCase(k)))
        if (resolved.forall(_.isDefined))
          Some(collatedKey(spark, table, resolved.flatten,
            SessionKeys.riderCollations(spark, name)).copy(where = w))
        else None
      }
    val exprKeys = SessionKeys.uniqueExprIndexes(spark, table).map {
      case (name, es, w) => UniqueKey(s"index '$name'", es, w)
    }
    (pkKeys ++ colKeys ++ exprKeys).distinct
  }

  /** SQLite's `UNIQUE constraint failed: <label>` over the
    * POST-STATEMENT state: any fully-non-NULL key tuple appearing
    * twice aborts (NULL members never conflict — measured; two NULL
    * keys coexist). One narrow group-count per declared key, bounded
    * by the statement's write — session-declared tables only.
    *
    * Divergence (error choice, not values): with a single row
    * violating both a CHECK and a UNIQUE constraint, SQLite reports
    * the CHECK (its per-row order) where this pre-write scan reports
    * UNIQUE first; either way the statement aborts with a real
    * constraint error. */
  def assertUnique(spark: SparkSession, table: String,
                   merged: DataFrame,
                   probe0: => Option[DataFrame] = None): Unit = {
    val keys = uniqueKeys(spark, table, merged.columns.toSeq)
    if (keys.isEmpty) return
    val probe = probe0 // forced once, only when keys exist
    keys.foreach { k =>
      val es = k.exprs.map(expr)
      val inScope = k.where match {
        case Some(w) => merged.filter(coalesce(
          expr(w).cast(BooleanType), lit(false)))
        case None => merged
      }
      val nonNull = inScope.filter(es.map(_.isNotNull).reduce(_ && _))
      // scale guard: a new duplicate must involve a key the STATEMENT
      // wrote — with `probe` (the incoming/updated slice) the count
      // runs over the semi-joined sliver, O(batch) instead of
      // O(table) per key (rows already in the table passed this check
      // at their own write). SQLite's index probe has the same cost
      // shape.
      val scoped = probe match {
        case Some(p) =>
          val pin = k.where match {
            case Some(w) => p.filter(coalesce(
              expr(w).cast(BooleanType), lit(false)))
            case None => p
          }
          val pk = pin.select(k.exprs.zipWithIndex.map { case (e2, i) =>
              expr(e2).as(s"__uq$i")
            }.toIndexedSeq: _*)
            .filter(k.exprs.indices.map(i => col(s"__uq$i").isNotNull)
              .reduce(_ && _))
            .distinct()
          nonNull.join(pk, k.exprs.zipWithIndex.map { case (e2, i) =>
              expr(e2) === pk(s"__uq$i")
            }.reduce(_ && _), "left_semi")
        case None => nonNull
      }
      val dup = scoped.groupBy(es: _*)
        .count().filter(col("count") > 1L).limit(1)
      if (!dup.isEmpty)
        throw new IllegalArgumentException(
          s"UNIQUE constraint failed: ${k.label}")
    }
  }

  /** Drop `df` rows whose fully-non-NULL key tuple already exists in
    * `base` — the skip/displacement primitive of DO NOTHING /
    * OR IGNORE / OR REPLACE over one declared key. NULL-keyed rows
    * never match (anti-join equality), SQLite's rule. */
  def dropConflicting(df: DataFrame, base: DataFrame,
                      key: UniqueKey): DataFrame = {
    val basePred = key.where.map(w =>
      coalesce(expr(w).cast(BooleanType), lit(false))).getOrElse(lit(true))
    val bk = base.filter(basePred)
      .select(key.exprs.zipWithIndex.map { case (e, i) =>
        expr(e).as(s"__uk$i")
      }.toIndexedSeq: _*)
      .filter(key.exprs.indices.map(i => col(s"__uk$i").isNotNull)
        .reduce(_ && _))
      .distinct()
    // a PARTIAL key's predicate rides the join condition: a left row
    // outside the predicate matches nothing, so it always survives
    val leftPred = key.where.map(w =>
      coalesce(expr(w).cast(BooleanType), lit(false))).getOrElse(lit(true))
    df.join(bk, leftPred && key.exprs.zipWithIndex.map { case (e, i) =>
        expr(e) === bk(s"__uk$i")
      }.reduce(_ && _), "left_anti")
  }

  /** Batch-internal one-winner-per-key dedup, settled set-based from
    * SQLite's row-at-a-time processing: rows are position-tagged in
    * source order and each fully-non-NULL key keeps its LATEST row
    * (`keepLast` — the REPLACE algorithm's outcome) or its EARLIEST
    * (DO NOTHING / OR IGNORE: the first row inserts, later conflictors
    * skip); NULL-key rows pass through untouched (they conflict with
    * nothing). Applied per declared key in declaration order —
    * equivalent to SQLite's sequential resolution for batches whose
    * displacements don't chain through already-displaced rows. */
  def dedupPerKey(spark: SparkSession, df: DataFrame,
                  keys: Seq[UniqueKey],
                  keepLast: Boolean): DataFrame = {
    if (keys.isEmpty) return df
    import org.apache.spark.sql.expressions.Window
    val pos = "__graft_upos"
    // a rowid-enabled table's slice already carries a `rowid` column —
    // stash it so the position tag can't collide (withSequentialRowid
    // appends a column of that name), and restore it after
    val stash = "__graft_upos_stash"
    val hadRowid = df.columns.exists(_.equalsIgnoreCase("rowid"))
    val dfIn = if (hadRowid) df.withColumnRenamed("rowid", stash) else df
    val tagged0 = Rowid.withSequentialRowid(spark, dfIn, 0L)
      .withColumnRenamed("rowid", pos)
    val tagged =
      if (hadRowid) tagged0.withColumnRenamed(stash, "rowid") else tagged0
    val resolved = keys.foldLeft(tagged) { (acc, k) =>
      val es = k.exprs.map(expr)
      val inScope = k.where.map(p =>
        coalesce(expr(p).cast(BooleanType), lit(false))).getOrElse(lit(true))
      val nonNull = es.map(_.isNotNull).reduce(_ && _) && inScope
      // exempt rows (NULL key / outside a PARTIAL index's predicate) must
      // not share a partition with in-scope rows on the same key value —
      // they'd inflate the in-scope row's row_number past 1 and silently
      // drop it. Partitioning on the scope flag keeps them apart.
      val w = Window.partitionBy((es :+ nonNull.cast(IntegerType)): _*)
        .orderBy(if (keepLast) col(pos).desc else col(pos).asc)
      acc.withColumn("__graft_urn",
          when(nonNull, row_number().over(w)).otherwise(lit(1)))
        .filter(col("__graft_urn") === 1).drop("__graft_urn")
    }
    resolved.select(df.columns.map(c => col(Ddl.quote(c))): _*)
  }

  /** The REPLACE algorithm's NOT NULL step (measured): an incoming
    * NULL in a NOT NULL column takes the column's declared DEFAULT;
    * without one the row falls through to [[guard]]'s abort. */
  def fillReplaceDefaults(spark: SparkSession, table: String,
                          df: DataFrame): DataFrame = {
    val nn = SessionKeys.notNullsFor(spark, table)
    if (nn.isEmpty) df
    else {
      val dflts = SessionKeys.defaultsFor(spark, table)
      val types = df.schema.fields
        .map(f => f.name.toLowerCase -> f.dataType).toMap
      nn.foldLeft(df) { (acc, c) =>
        dflts.get(c.toLowerCase) match {
          case Some((_, execSql)) =>
            val actual = df.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)
            acc.withColumn(actual, coalesce(col(Ddl.quote(actual)),
              expr(execSql).cast(types(c.toLowerCase))))
          case None => acc
        }
      }
    }
  }
}
