package graft.ingest

import org.apache.spark.sql.types._

/** CREATE TABLE text rendered from a StructType — the Spark analog of
  * the reference's SQLAlchemy DDL reflection round-trip (reference
  * pandasqlite/pandasqlite.py:116-120). Divergences (SURVEY.md §1.4):
  * backtick identifier quoting (Spark SQL dialect) and no implicit
  * pandas row-index column.
  */
object Ddl {
  def sqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                           => "BIGINT"
    case FloatType                          => "FLOAT"
    case DoubleType                         => "DOUBLE"
    case _: DecimalType                     => dt.sql
    case BooleanType                        => "BOOLEAN"
    case DateType                           => "DATE"
    case TimestampType | TimestampNTZType   => "TIMESTAMP"
    case BinaryType                         => "BLOB"
    case StringType                         => "TEXT"
    case ArrayType(et, _)                   => s"ARRAY<${sqlType(et)}>"
    case other                              => other.sql
  }

  def createTable(tableName: String, schema: StructType): String = {
    val cols = schema.fields
      .map(f => s"\t`${f.name}` ${sqlType(f.dataType)}")
      .mkString(", \n")
    s"\nCREATE TABLE `$tableName` (\n$cols\n)\n\n"
  }
}
