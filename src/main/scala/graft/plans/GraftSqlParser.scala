package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Injected SQL front-end for the table-format's metadata commands —
  * the `injectParser` extension point, completing the
  * SparkSessionExtensions taxonomy the engine exercises (expressions,
  * typed aggregator, optimizer rule, planner strategy + physical
  * operator, DSv2 connectors, SQL functions, and now parser).
  *
  * Syntax (anything else delegates verbatim to Spark's parser, so the
  * whole SQL surface is untouched):
  *
  * {{{
  * GRAFT HISTORY '<table root>'
  * GRAFT DETAIL '<table root>'
  * GRAFT CHANGES '<table root>' KEY <col> FROM <v> TO <v> [WITH PREIMAGES]
  * }}}
  *
  * HISTORY and CHANGES are READ-ONLY metadata/CDC queries, resolved
  * eagerly at parse time to the corresponding [[graft.table.GraftTable]]
  * plan — the route a SQL-only client uses to poll a table's history
  * or consume its change feed without touching the Scala API.
  *
  * The MUTATING verbs (round 12) parse to lazily-run Command nodes
  * instead — [[GraftDeleteCommand]] / [[GraftRestoreCommand]] — so the
  * side effect fires ONLY at execution, never at parse/analyze/EXPLAIN
  * time (GraftSqlParserSpec pins EXPLAIN's side-effect-freedom):
  *
  * {{{
  * GRAFT CREATE '<root>' KEY <col> [RANGE CLUSTER INTO <n> FILES]
  *   USING <query>
  * GRAFT APPEND INTO '<root>' KEY <col> USING <query>
  * GRAFT DELETE FROM '<root>' KEY <col> [USING MOR] WHERE <predicate>
  * GRAFT MERGE INTO '<root>' KEY <col> [TXN <id>] USING <query>
  * GRAFT RESTORE '<root>' TO <version>
  * GRAFT CLONE '<src root>' KEY <col> INTO '<dst root>' [VERSION <v>]
  * GRAFT OPTIMIZE '<root>' [TARGET <n> FILES]
  * GRAFT CLUSTER '<root>' BY (<c1>[, <c2>...]) [TARGET <n> FILES]
  * GRAFT VACUUM '<root>' KEEP <n>
  * GRAFT INDEX '<root>' BLOOM (<c1>[, <c2>...]) [FPP <p>]
  * GRAFT CONSTRAINT '<root>' ADD <name> CHECK (<expr>)
  * GRAFT CONSTRAINT '<root>' DROP <name>
  * GRAFT ALTER '<root>' RENAME COLUMN <old> TO <new>
  * GRAFT ALTER '<root>' KEY <col> DROP COLUMN <name>
  * GRAFT ALTER '<root>' ADD COLUMN <name> <type> [DEFAULT <expr>]
  * GRAFT AUTOCOMPACT '<root>' MIN <n> [SMALL <bytes>] [TARGET <m>]
  * GRAFT AUTOCOMPACT '<root>' OFF
  * GRAFT UPDATE '<root>' KEY <col> SET <c> = <expr>[, ...] WHERE <pred>
  * GRAFT OVERWRITE '<root>' KEY <col> WHERE <pred> USING <query>
  * EXPLAIN [EXTENDED|FORMATTED] GRAFT <any of the above>
  * }}}
  *
  * With the read commands, the registered `graft` batch source, and
  * the `graft-cdf` streaming source, the ENTIRE table lifecycle —
  * ingest, upsert, erase, reorganize, retain, time-travel, replicate —
  * is reachable from SQL text plus format strings alone. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val Changes =
    """(?is)\s*GRAFT\s+CHANGES\s+'([^']+)'\s+KEY\s+(\w+)\s+FROM\s+(\d+)\s+TO\s+(\d+)(\s+WITH\s+PREIMAGES)?\s*""".r
  private val History =
    """(?is)\s*GRAFT\s+HISTORY\s+'([^']+)'\s*""".r
  private val Detail =
    """(?is)\s*GRAFT\s+DETAIL\s+'([^']+)'\s*""".r
  private val Delete =
    """(?is)\s*GRAFT\s+DELETE\s+FROM\s+'([^']+)'\s+KEY\s+(\w+)\s+(USING\s+MOR\s+)?WHERE\s+(.+?)\s*""".r
  private val Merge =
    """(?is)\s*GRAFT\s+MERGE\s+INTO\s+'([^']+)'\s+KEY\s+(\w+)\s+(?:TXN\s+(\d+)\s+)?USING\s+(.+?)\s*""".r
  private val Create =
    """(?is)\s*GRAFT\s+CREATE\s+'([^']+)'\s+KEY\s+(\w+)\s+(?:RANGE\s+CLUSTER\s+INTO\s+(\d+)\s+FILES\s+)?USING\s+(.+?)\s*""".r
  private val Append =
    """(?is)\s*GRAFT\s+APPEND\s+INTO\s+'([^']+)'\s+KEY\s+(\w+)\s+USING\s+(.+?)\s*""".r
  private val Restore =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+(\d+)\s*""".r
  private val Clone =
    """(?is)\s*GRAFT\s+CLONE\s+'([^']+)'\s+KEY\s+(\w+)\s+INTO\s+'([^']+)'(?:\s+VERSION\s+(\d+))?\s*""".r
  private val RestoreTs =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+TIMESTAMP\s+(\d+)\s*""".r
  private val Optimize =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+)\s+FILES)?(?:\s+WHERE\s+(.+?))?\s*""".r
  private val Cluster =
    """(?is)\s*GRAFT\s+CLUSTER\s+'([^']+)'\s+BY\s+\(([\w\s,]+)\)(?:\s+TARGET\s+(\d+)\s+FILES)?(\s+INCREMENTAL)?\s*""".r
  private val Vacuum =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+KEEP\s+(\d+)\s*""".r
  private val Index =
    """(?is)\s*GRAFT\s+INDEX\s+'([^']+)'\s+BLOOM\s+\(([\w\s,]+)\)(?:\s+FPP\s+([0-9.]+))?\s*""".r
  private val ConstraintAdd =
    """(?is)\s*GRAFT\s+CONSTRAINT\s+'([^']+)'\s+ADD\s+(\w+)\s+CHECK\s+\((.+)\)\s*""".r
  private val ConstraintDrop =
    """(?is)\s*GRAFT\s+CONSTRAINT\s+'([^']+)'\s+DROP\s+(\w+)\s*""".r
  private val RenameColumn =
    """(?is)\s*GRAFT\s+ALTER\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val DropColumn =
    """(?is)\s*GRAFT\s+ALTER\s+'([^']+)'\s+KEY\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  // the type is a DDL fragment (possibly parenthesized: DECIMAL(18,2));
  // lazy so an optional DEFAULT tail never folds into it
  private val AddColumn =
    """(?is)\s*GRAFT\s+ALTER\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+([\w(),\s]+?)(?:\s+DEFAULT\s+(.+?))?\s*""".r
  private val AutoCompact =
    """(?is)\s*GRAFT\s+AUTOCOMPACT\s+'([^']+)'\s+MIN\s+(\d+)(?:\s+SMALL\s+(\d+))?(?:\s+TARGET\s+(\d+))?\s*""".r
  private val AutoCompactOff =
    """(?is)\s*GRAFT\s+AUTOCOMPACT\s+'([^']+)'\s+OFF\s*""".r
  // greedy SET blob + the LAST "WHERE": a scalar assignment expression
  // never contains WHERE, the predicate may not either — same shape
  // discipline as Delete's
  private val Update =
    """(?is)\s*GRAFT\s+UPDATE\s+'([^']+)'\s+KEY\s+(\w+)\s+SET\s+(.+)\s+WHERE\s+(.+?)\s*""".r
  private val Overwrite =
    """(?is)\s*GRAFT\s+OVERWRITE\s+'([^']+)'\s+KEY\s+(\w+)\s+WHERE\s+(.+?)\s+USING\s+(.+?)\s*""".r
  private val Explain =
    """(?is)\s*EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+|CODEGEN\s+|COST\s+)?(GRAFT\s.+)""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Changes(root, key, from, to, pre) =>
      graft.table.GraftTable.open(session, root, key)
        .changes(from.toLong, to.toLong, preimages = pre != null)
        .queryExecution.logical
    case History(root) =>
      // history() never consults the key column
      graft.table.GraftTable.open(session, root, "__unused__")
        .history().queryExecution.logical
    case Detail(root) =>
      graft.table.GraftTable.open(session, root, "__unused__")
        .detail().queryExecution.logical
    case Delete(root, key, mor, whereSql) =>
      // validate the predicate's SYNTAX at parse time like the other
      // verbs — an unparsable WHERE would otherwise surface only at
      // execution (and fold to Unknown in PredicateTree, silently
      // disabling pruning before the analysis error fired)
      delegate.parseExpression(whereSql)
      GraftDeleteCommand(root, key, whereSql, mor = mor != null)
    case Merge(root, key, txn, sourceSql) =>
      // validate the source query's SYNTAX now (parse only — analysis
      // and execution stay at run time), so a typo fails at parse like
      // any SQL statement instead of mid-mutation
      delegate.parsePlan(sourceSql)
      GraftMergeCommand(root, key,
        Option(txn).map(_.toLong).getOrElse(-1L), sourceSql)
    case Create(root, key, cluster, sourceSql) =>
      delegate.parsePlan(sourceSql)
      GraftCreateCommand(root, key, Option(cluster).map(_.toInt), sourceSql)
    case Append(root, key, sourceSql) =>
      delegate.parsePlan(sourceSql)
      GraftAppendCommand(root, key, sourceSql)
    case RestoreTs(root, ms) => // before Restore: TIMESTAMP <n> would
      GraftRestoreCommand(root, -1L, Some(ms.toLong)) // half-match TO <n>
    case Restore(root, to) =>
      GraftRestoreCommand(root, to.toLong)
    case Clone(src, key, dst, version) =>
      GraftCloneCommand(src, key, dst,
        Option(version).map(_.toLong).getOrElse(-1L))
    case Optimize(root, target, whereSql) =>
      Option(whereSql).foreach(delegate.parseExpression) // syntax now
      GraftOptimizeCommand(root,
        Option(target).map(_.toInt).getOrElse(1), Option(whereSql))
    case Cluster(root, by, target, incr) =>
      GraftClusterCommand(root,
        by.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        Option(target).map(_.toInt).getOrElse(16),
        incremental = incr != null)
    case Vacuum(root, keep) =>
      GraftVacuumCommand(root, keep.toInt)
    case Index(root, cols, fpp) =>
      GraftIndexCommand(root,
        cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        Option(fpp).map(_.toDouble).getOrElse(0.01))
    case ConstraintAdd(root, name, check) =>
      // validate the expression's SYNTAX at parse time, like any SQL
      delegate.parseExpression(check)
      GraftConstraintCommand(root, name, Some(check))
    case ConstraintDrop(root, name) =>
      GraftConstraintCommand(root, name, None)
    case RenameColumn(root, oldName, newName) =>
      GraftRenameColumnCommand(root, oldName, newName)
    case DropColumn(root, key, name) =>
      GraftDropColumnCommand(root, key, name)
    case AutoCompact(root, minN, small, target) =>
      GraftAutoCompactCommand(root, Some(minN.toInt),
        Option(small).map(_.toLong), Option(target).map(_.toInt))
    case AutoCompactOff(root) =>
      GraftAutoCompactCommand(root, None, None, None)
    case AddColumn(root, name, typeDdl, defaultSql) =>
      // validate the TYPE and the default's SYNTAX at parse time, like
      // the other verbs (the constant-expression check runs at execute)
      delegate.parseDataType(typeDdl)
      Option(defaultSql).foreach(delegate.parseExpression)
      GraftAddColumnCommand(root, name, typeDdl.trim,
        Option(defaultSql).map(_.trim))
    case Update(root, key, setBlob, whereSql) =>
      val assignments = splitAssignments(setBlob)
      // validate every RHS and the predicate's SYNTAX at parse time,
      // like the other mutating verbs
      assignments.foreach { case (_, e) => delegate.parseExpression(e) }
      delegate.parseExpression(whereSql)
      GraftUpdateCommand(root, key, assignments, whereSql)
    case Overwrite(root, key, whereSql, sourceSql) =>
      delegate.parseExpression(whereSql)
      delegate.parsePlan(sourceSql)
      GraftOverwriteCommand(root, key, whereSql, sourceSql)
    case Explain(mode, inner) =>
      // Spark's own parser never sees the GRAFT text, so EXPLAIN over
      // a GRAFT statement is assembled here — the inner plan is built
      // (a Command node for mutators), never executed
      import org.apache.spark.sql.execution.command.ExplainCommand
      import org.apache.spark.sql.execution.{CodegenMode, CostMode, ExtendedMode, FormattedMode, SimpleMode}
      val m = Option(mode).map(_.trim.toUpperCase).getOrElse("") match {
        case "EXTENDED"  => ExtendedMode
        case "FORMATTED" => FormattedMode
        case "CODEGEN"   => CodegenMode
        case "COST"      => CostMode
        case _           => SimpleMode
      }
      ExplainCommand(parsePlan(inner), m)
    case _ => delegate.parsePlan(sqlText)
  }

  /** split a SET blob on TOP-LEVEL commas (commas inside function-call
    * parens belong to their expression) into (column, expression)
    * pairs; malformed assignments fail at parse like any SQL */
  private def splitAssignments(blob: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    blob.foreach { c =>
      if (c == ',' && depth == 0) { parts += cur.toString; cur.clear() }
      else {
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
      }
    }
    parts += cur.toString
    val One = """(?s)\s*(\w+)\s*=\s*(.+?)\s*""".r
    parts.toSeq.map {
      case One(c, e) => (c, e)
      case bad => throw new IllegalArgumentException(
        s"GRAFT UPDATE: malformed SET assignment '$bad' " +
          "(expected <column> = <expression>)")
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
