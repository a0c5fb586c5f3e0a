package graft.exec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQLite 3.37 STRICT-table type enforcement (measured on 3.40.1):
  *
  *  - INTEGER/INT columns take integer values, plus text/real values
  *    that convert LOSSLESSLY (text '  12  ' and real 2.0 store as 12;
  *    real 2.5 errors naming REAL, text '1.5' errors naming REAL —
  *    SQLite classifies convertible-to-real text by its numeric class
  *    — and non-numeric text errors naming TEXT);
  *  - REAL columns take numerics (integers widen) and numeric text;
  *  - TEXT columns take anything except BLOB (numerics render);
  *  - BLOB columns take only BLOB;
  *  - the error is SQLite's own: `cannot store <CLASS> value in
  *    <decltype> column <table>.<col>`.
  *
  * The storage class of the INCOMING value is static in this engine
  * (lake columns are typed), so each rule compiles to a row-local
  * conditional around the cast — set-based, zero extra passes; a
  * violating row raises through `raise_error` and statement-level
  * atomicity ([[Atomic]]) rolls the write back.
  */
object Strict {

  /** SQLite storage class of a Spark type (same mapping the native
    * sqlite_typeof expression uses). */
  def storageClass(dt: DataType): String = dt match {
    case NullType => "null"
    case BooleanType | ByteType | ShortType | IntegerType | LongType =>
      "integer"
    case FloatType | DoubleType | _: DecimalType => "real"
    case BinaryType => "blob"
    case _ => "text" // strings + temporals (to_sql ships those as TEXT)
  }

  private def err(cls: String, decl: String, loc: String, dt: DataType) =
    raise_error(lit(s"cannot store $cls value in $decl column $loc"))
      .cast(dt)

  /** Checked cast of `v` (static source type `src`) into a STRICT
    * column declared `decl` (lake type `target`). */
  def cast(v: Column, src: DataType, decl: String, target: DataType,
           loc: String): Column = {
    val checked = (storageClass(src), target) match {
      case ("null", _) => lit(null).cast(target)
      case ("blob", BinaryType) => v
      case ("blob", _) => err("BLOB", decl, loc, target)
      case (_, BinaryType) =>
        err(storageClass(src).toUpperCase, decl, loc, target)
      case ("integer", LongType) => v.cast(target)
      case ("real", LongType) =>
        when(v.cast(LongType).cast(DoubleType) === v.cast(DoubleType),
          v.cast(LongType))
          .otherwise(err("REAL", decl, loc, target))
      case ("text", LongType) => {
        val d = v.cast(DoubleType)
        when(d.isNull, err("TEXT", decl, loc, target))
          .when(d =!= d.cast(LongType).cast(DoubleType),
            err("REAL", decl, loc, target))
          .otherwise(coalesce(v.cast(LongType), d.cast(LongType)))
      }
      case ("integer" | "real", DoubleType) => v.cast(target)
      case ("text", DoubleType) =>
        when(v.cast(DoubleType).isNull, err("TEXT", decl, loc, target))
          .otherwise(v.cast(DoubleType))
      case (_, StringType) => v.cast(StringType)
      case (cls, _) => err(cls.toUpperCase, decl, loc, target)
    }
    when(v.isNull, lit(null).cast(target)).otherwise(checked)
  }

  /** SQL-text twin of [[cast]] for the string-built UPDATE rewrites.
    * `e` must be a self-contained SQL expression; the caller resolves
    * its static type first. */
  def castSql(e: String, src: DataType, decl: String, targetSql: String,
              loc: String): String = {
    def raise(cls: String) =
      s"CAST(raise_error('cannot store $cls value in $decl column $loc') " +
        s"AS $targetSql)"
    val t = targetSql.toUpperCase
    val body = (storageClass(src), t) match {
      case ("null", _) => s"CAST(NULL AS $targetSql)"
      case ("blob", "BINARY") => s"($e)"
      case ("blob", _) => raise("BLOB")
      case (cls, "BINARY") => raise(cls.toUpperCase)
      case ("integer", "BIGINT") => s"CAST(($e) AS BIGINT)"
      case ("real", "BIGINT") =>
        s"CASE WHEN CAST(CAST(($e) AS BIGINT) AS DOUBLE) = " +
          s"CAST(($e) AS DOUBLE) THEN CAST(($e) AS BIGINT) " +
          s"ELSE ${raise("REAL")} END"
      case ("text", "BIGINT") =>
        s"CASE WHEN CAST(($e) AS DOUBLE) IS NULL THEN ${raise("TEXT")} " +
          s"WHEN CAST(($e) AS DOUBLE) <> " +
          s"CAST(CAST(CAST(($e) AS DOUBLE) AS BIGINT) AS DOUBLE) " +
          s"THEN ${raise("REAL")} " +
          s"ELSE COALESCE(CAST(($e) AS BIGINT), " +
          s"CAST(CAST(($e) AS DOUBLE) AS BIGINT)) END"
      case ("integer" | "real", "DOUBLE") => s"CAST(($e) AS DOUBLE)"
      case ("text", "DOUBLE") =>
        s"CASE WHEN CAST(($e) AS DOUBLE) IS NULL THEN ${raise("TEXT")} " +
          s"ELSE CAST(($e) AS DOUBLE) END"
      case (_, "STRING") => s"CAST(($e) AS STRING)"
      case (cls, _) => raise(cls.toUpperCase)
    }
    s"CASE WHEN ($e) IS NULL THEN CAST(NULL AS $targetSql) ELSE $body END"
  }
}
