package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Hive strict-mode query guards (`hive.mapred.mode=strict`, plus the
  * per-check `hive.strict.checks.*` toggles of later Hive lines):
  *
  *   - `orderby.no.limit` — a global ORDER BY with no LIMIT is refused
  *     (reference: clientnegative/strict_orderby.q; a total sort of an
  *     unbounded result funnels the full table through one reducer).
  *   - `cartesian.product` — a join with no condition is refused
  *     (strict_join.q / input4.q).
  *   - `no.partition.filter` — scanning a partitioned table with no
  *     filter on any of its partition columns is refused
  *     (strict_pruning.q / input_part0_neg.q; an unpruned scan of a
  *     100 TB partitioned table is almost always a mistake).
  *   - `type.safety` — comparing a bigint with a string or a double is
  *     refused (compare_string_bigint.q / compare_double_bigint.q;
  *     reference ExprNodeGenericFuncDesc.java:213-229, ErrorMsg
  *     10123/10124: the compare goes through DOUBLE, which silently
  *     rounds longs beyond 2^53).
  *
  * All checks default OFF (Spark parity — the engine's default session
  * mode is nonstrict); `SET hive.mapred.mode=strict` turns all three on,
  * and each `hive.strict.checks.<name>=true|false` overrides
  * individually, matching HiveConf's pairing of the legacy mode with the
  * fine-grained flags.
  *
  * Implemented as an analyzer CHECK rule (injectCheckRule): it inspects
  * the analyzed plan and throws, never rewrites, so it costs nothing
  * unless the confs are set.
  */
object StrictChecks {

  private def enabled(session: SparkSession, name: String): Boolean = {
    val strict =
      session.conf.get("hive.mapred.mode", "nonstrict").trim
        .equalsIgnoreCase("strict")
    session.conf.getOption(s"hive.strict.checks.$name")
      .map(_.trim.equalsIgnoreCase("true")).getOrElse(strict)
  }

  // Thread-scoped (NOT a session conf): analysis runs on the calling
  // thread, and a session-wide flag would let a concurrent user query on
  // the same SparkSession silently bypass every strict guard while a
  // maintenance task holds checks suspended. A depth counter so nested
  // maintenance (compaction inside CoW) unwinds correctly. Child threads
  // deliberately start UNSUSPENDED (childValue = 0): a pool thread
  // created while a maintenance block holds depth>=1 would otherwise
  // inherit the suspension at creation with nothing ever decrementing it
  // — strict checks permanently and silently disabled on that thread.
  // Fail-closed is the right default: maintenance bodies analyze on the
  // calling thread, so losing inheritance costs nothing in practice.
  private val suspendDepth = new InheritableThreadLocal[Integer] {
    override def initialValue(): Integer = 0
    override def childValue(parent: Integer): Integer = 0
  }

  /** Engine-internal maintenance reads (CoW rewrites, compaction/merge,
    * EXPORT staging) are tasks, not user queries — the reference's strict
    * checks live in the query SemanticAnalyzer and never block DDL or
    * maintenance jobs, so e.g. ALTER TABLE ... PARTITION (...) CONCATENATE
    * must not be refused for scanning its own partition unfiltered.
    * (`session` kept for call-site symmetry; suspension is per-thread.) */
  def suspended[T](session: SparkSession)(body: => T): T = {
    suspendDepth.set(suspendDepth.get + 1)
    try body
    finally suspendDepth.set(suspendDepth.get - 1)
  }

  def apply(session: SparkSession): LogicalPlan => Unit = plan =>
    if (suspendDepth.get == 0) {
      // fast exit on the common (nonstrict, no overrides) path
      val orderBy = enabled(session, "orderby.no.limit")
      val cartesian = enabled(session, "cartesian.product")
      val pruning = enabled(session, "no.partition.filter")
      val typeSafety = enabled(session, "type.safety")
      if (orderBy || cartesian || pruning || typeSafety) {
        if (orderBy) checkOrderBy(plan)
        if (cartesian) checkCartesian(plan)
        if (pruning) checkPruning(plan)
        if (typeSafety) checkTypeSafety(plan)
      }
    }

  /** The reference refuses bigint↔string and bigint↔double comparisons in
    * strict mode (the compare coerces both sides to double — longs above
    * 2^53 round). Hive checks the DECLARED operand types, i.e. after
    * user-written casts but before implicit coercion
    * (ExprNodeGenericFuncDesc.newInstance runs on the pre-coercion
    * children), so this strips only analysis-inserted casts (no
    * USER_SPECIFIED_CAST tag — both plain coercion and the engine's
    * CompareViaDouble rewrite) to recover each side's declared type. */
  private def checkTypeSafety(plan: LogicalPlan): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def declared(e: Expression): DataType = e match {
      case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
        declared(c.child)
      case other => other.dataType
    }
    def bad(a: DataType, b: DataType): Option[String] = (a, b) match {
      case (LongType, StringType) | (StringType, LongType) => Some("strings")
      case (LongType, DoubleType) | (DoubleType, LongType) => Some("doubles")
      case _ => None
    }
    plan.foreach(_.expressions.foreach(_.foreach {
      case cmp: BinaryComparison =>
        bad(declared(cmp.left), declared(cmp.right)).foreach(kind =>
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"In strict mode, comparing bigints and $kind is not " +
                "allowed, it may result in a loss of precision. If you " +
                "really want to perform the operation, set " +
                "hive.mapred.mode=nonstrict"))))
      case _ =>
    }))
  }

  /** A global Sort with no Limit above it anywhere. Sorts under a Limit
    * (the TopN shape) and per-partition sorts (SORT BY) pass. */
  private def checkOrderBy(plan: LogicalPlan): Unit = {
    def walk(p: LogicalPlan, underLimit: Boolean): Unit = p match {
      case GlobalLimit(_, child) => walk(child, underLimit = true)
      case s @ Sort(_, true, _, _) =>
        if (!underLimit) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            ("In strict mode, if ORDER BY is specified, LIMIT must also " +
              "be specified (set hive.strict.checks.orderby.no.limit to " +
              "false to disable)")))
        s.children.foreach(walk(_, underLimit = false))
      // a Limit guards only its own query block: a subquery below a
      // Join/Union/Aggregate starts a fresh block
      case other =>
        val reset = other match {
          case _: Join | _: Union | _: Aggregate | _: SubqueryAlias => false
          case _ => underLimit
        }
        other.children.foreach(walk(_, reset))
        other.subqueries.foreach(walk(_, underLimit = false))
    }
    walk(plan, underLimit = false)
  }

  private def checkCartesian(plan: LogicalPlan): Unit =
    plan.foreach {
      case j @ Join(_, _, Inner | Cross, None, _) =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            ("In strict mode, cartesian product is not allowed (a join " +
              "with no condition; set hive.strict.checks.cartesian.product " +
              s"to false to disable): ${j.simpleString(1)}")))
      case _ =>
    }

  /** Every partitioned leaf relation must have at least one filter over
    * one of its partition columns somewhere in the plan. Matches file
    * relations (path or catalog parquet/orc), catalog Hive tables, and
    * graft DSv2 relations (whose partition columns surface through the
    * Table's partitioning transforms). */
  private def checkPruning(plan: LogicalPlan): Unit = {
    // the check applies to SCANS: an INSERT's target relation is not a
    // read, so recurse only into the query side of write commands
    plan match {
      case i: InsertIntoStatement => return checkPruning(i.query)
      case w: V2WriteCommand      => return checkPruning(w.query)
      case _ => ()
    }
    // a bare relation lookup (SubqueryAlias over a leaf) is not a query:
    // Spark analyzes one internally for every catalog refreshTable — only
    // plans with an actual operator over the scan are checked
    def bareLookup(p: LogicalPlan): Boolean = p match {
      case SubqueryAlias(_, child) => bareLookup(child)
      case l if l.children.isEmpty => true
      case _ => false
    }
    if (bareLookup(plan)) return
    // attributes referenced by any predicate: Filter conditions AND the
    // PUSHABLE conjuncts of join conditions (the reference's check runs
    // after predicate pushdown, so `JOIN ... ON t.ds='x' AND t.k=d.k`
    // prunes via the ds conjunct — but a bare equi-join `t.ds = o.ds`
    // prunes nothing and must NOT satisfy the check). Pushability is
    // join-type aware: an ON conjunct filters a side only when that side
    // is not null-preserved (a LEFT JOIN's left-side ON predicate scans
    // every left partition regardless).
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans._
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def pushableSide(jt: JoinType, side: String): Boolean = jt match {
      case Inner | Cross | LeftSemi => true
      case RightOuter => side == "left"
      case LeftOuter | LeftAnti => side == "right"
      case _ => false // FullOuter and friends: nothing pushes
    }
    // equi-join equivalence edges (Inner/semi only — constraint
    // propagation does not hold onto a preserved outer side): a filter
    // on d.ds transfers to t.ds through t.ds = d.ds, the common
    // filter-via-dimension shape Hive accepts
    val equivEdges = scala.collection.mutable.ArrayBuffer
      .empty[(org.apache.spark.sql.catalyst.expressions.Attribute,
              org.apache.spark.sql.catalyst.expressions.Attribute)]
    def attrOf(e: Expression)
        : Option[org.apache.spark.sql.catalyst.expressions.Attribute] =
      e match {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          Some(a)
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          attrOf(c.child) // casts (user or coercion) keep equivalence
        case _ => None
      }
    // a pure attribute=attribute comparison NEVER prunes by itself —
    // whether it appears in ON or in WHERE (`FROM a, b WHERE a.ds=b.ds`
    // is the same plan shape) — it only TRANSFERS a filter from one
    // column to the other, so it contributes an equivalence edge, not a
    // direct reference
    def attrEq(c: Expression)
        : Option[(org.apache.spark.sql.catalyst.expressions.Attribute,
                  org.apache.spark.sql.catalyst.expressions.Attribute)] =
      c match {
        case EqualTo(l, r) =>
          for (a <- attrOf(l); b <- attrOf(r)) yield (a, b)
        case _ => None
      }
    val directRefs = plan.collect {
      case Filter(cond, _) =>
        conjuncts(cond).flatMap { c =>
          attrEq(c) match {
            case Some(edge) => equivEdges += edge; Nil
            case None => c.references.toSeq
          }
        }
      case Join(left, right, jt, Some(cond), _) =>
        val cs = conjuncts(cond)
        if (jt == Inner || jt == Cross || jt == LeftSemi)
          cs.foreach(c => attrEq(c).foreach(equivEdges += _))
        cs.filter { c =>
          attrEq(c).isEmpty && {
            val refs = c.references
            (refs.subsetOf(left.outputSet) && pushableSide(jt, "left")) ||
            (refs.subsetOf(right.outputSet) && pushableSide(jt, "right"))
          }
        }.flatMap(_.references.toSeq)
    }.flatten
    // expand through Project aliases so `WHERE d='1'` over
    // `(SELECT ds AS d ...)` counts as a predicate on ds (alias chains
    // resolved to a fixpoint)
    val aliasRefs = plan.collect {
      case p: Project => p.projectList.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Alias =>
          a.exprId -> a.child.references
      }
    }.flatten.toMap
    var filtered = AttributeSet(directRefs)
    var grew = true
    while (grew) {
      val viaAlias = filtered.toSeq.flatMap(a => aliasRefs.get(a.exprId))
        .flatMap(_.toSeq)
      val viaEquiv = equivEdges.flatMap { case (a, b) =>
        (if (filtered.contains(a)) Seq(b) else Nil) ++
          (if (filtered.contains(b)) Seq(a) else Nil)
      }
      val expanded = filtered ++ AttributeSet(viaAlias ++ viaEquiv)
      grew = expanded.size > filtered.size
      filtered = expanded
    }
    def fail(name: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          (s"In strict mode, no partition predicate found for partitioned " +
            s"table $name (set hive.strict.checks.no.partition.filter to " +
            "false to disable)")))
    def partAttrs(partNames: Seq[String], output: Seq[Attribute]): Seq[Attribute] =
      output.filter(a => partNames.exists(_.equalsIgnoreCase(a.name)))
    plan.foreach {
      case r: LogicalRelation
          if r.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        val fs = r.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        val parts = fs.partitionSchema.fieldNames.toSeq
        if (parts.nonEmpty &&
          !partAttrs(parts, r.output).exists(filtered.contains))
          fail(r.catalogTable.map(_.identifier.unquotedString)
            .getOrElse(fs.location.rootPaths.mkString(",")))
      case h: HiveTableRelation if h.partitionCols.nonEmpty =>
        if (!h.partitionCols.map(_.name)
          .flatMap(n => partAttrs(Seq(n), h.output))
          .exists(filtered.contains))
          fail(h.tableMeta.identifier.unquotedString)
      case v: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        val parts = v.table.partitioning().toSeq.flatMap(_.references())
          .flatMap(_.fieldNames().headOption)
        if (parts.nonEmpty &&
          !partAttrs(parts, v.output).exists(filtered.contains))
          fail(v.table.name())
      case _ =>
    }
  }
}
