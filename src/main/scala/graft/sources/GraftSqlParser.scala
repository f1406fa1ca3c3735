package graft.sources

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Thin parser shim for the one piece of lakehouse SQL Spark's
  * grammar lacks: Delta's `DESCRIBE DETAIL` statement. The habituated
  * form
  *
  * {{{ DESCRIBE DETAIL lake.`/data/t` }}}
  *
  * rewrites to the equivalent stored-procedure call
  * (`CALL lake.describe('/data/t')` — wave 67's table-health row) and
  * is handed to the DELEGATE parser; every other statement passes
  * through untouched, so the shim adds no grammar of its own and no
  * maintenance surface. `DESCRIBE DETAIL` is not valid Spark SQL, so
  * nothing that parsed before can change meaning.
  *
  * Reference: Delta Lake's DESCRIBE DETAIL (public docs/parser) —
  * re-expressed as a pure rewrite onto the Spark 4 ProcedureCatalog. */
final class GraftSqlParser(delegate: ParserInterface)
  extends ParserInterface {

  private val describeDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(\w+)\s*\.\s*`([^`]+)`\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeDetail(catalog, path) =>
      delegate.parsePlan(
        s"CALL $catalog.describe('${path.replace("'", "''")}')")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
