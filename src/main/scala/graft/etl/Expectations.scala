package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level data-quality EXPECTATIONS — the declarative
  * expect / expect-or-drop / expect-or-fail contract of lakehouse
  * pipelines (Delta Live Tables' surface), built as plain Catalyst
  * columns so every mode stays scale-shaped:
  *
  *  - [[withFlags]] appends one boolean per rule plus `pass_all` — a
  *    pure NARROW codegen projection (audit mode: keep everything,
  *    see what failed);
  *  - [[split]] routes rows to (passed, quarantined) — the
  *    expect-or-drop mode; the quarantine side carries a `violations`
  *    array naming every failed rule so triage never re-derives it;
  *  - [[audit]] is ONE aggregation pass → per-rule violation counts
  *    and rates (output bounded at |rules| + 1 rows, whatever the
  *    corpus);
  *  - [[enforce]] is expect-or-fail: a bounded audit collect, then a
  *    loud exception naming the violated rules if any rate exceeds
  *    its tolerance — never a silent drop.
  *
  * A null predicate result counts as a VIOLATION (`coalesce(p, false)`
  * everywhere): an expectation that cannot be evaluated has not been
  * met — the conservative reading a data contract needs.
  */
object Expectations {

  /** A named row-level expectation. `tolerance` is the violation-RATE
    * ceiling [[enforce]] applies (0.0 = any violation fails). */
  case class Rule(name: String, predicate: Column, tolerance: Double = 0.0) {
    require(name.matches("[A-Za-z0-9_]+"),
      s"rule name '$name' must be [A-Za-z0-9_]+")
    require(tolerance >= 0.0 && tolerance <= 1.0,
      s"rule '$name' tolerance=$tolerance")
  }

  private def met(r: Rule): Column = coalesce(r.predicate, lit(false))

  /** Append `ok_<name>` per rule + `pass_all`. Narrow, codegen. */
  def withFlags(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val flagged = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"ok_${r.name}", met(r))
    }
    flagged.withColumn("pass_all",
      rules.map(r => col(s"ok_${r.name}")).reduce(_ && _))
  }

  /** Expect-or-drop: (passed rows — original schema, quarantined rows
    * + a `violations` array naming every failed rule). Two narrow
    * filters over the flagged frame; callers persist `df` first when
    * both sides will be consumed. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = withFlags(df, rules)
    val flagCols = rules.map(r => s"ok_${r.name}") :+ "pass_all"
    val passed = flagged.where(col("pass_all"))
      .drop(flagCols: _*)
    val quarantined = flagged.where(!col("pass_all"))
      .withColumn("violations",
        filter(array(rules.map(r =>
          when(!col(s"ok_${r.name}"), lit(r.name))): _*), _.isNotNull))
      .drop(flagCols: _*)
    (passed, quarantined)
  }

  /** Per-rule violation counts/rates — ONE agg pass over the corpus
    * (the per-rule sums all ride the same partial aggregate), output
    * bounded at |rules| rows whatever the corpus size. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    // coalesce: sum over ZERO rows is null, but an empty input
    // trivially satisfies every expectation — audit must report 0,
    // not null (enforce reads these as primitives)
    val aggs = rules.map { r =>
      coalesce(sum(when(!met(r), 1L).otherwise(0L)), lit(0L))
        .as(s"__v_${r.name}")
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the ONE agg row with stack — a per-rule union of selects
    // would replicate the agg subtree |rules| times in the plan
    val pairs = rules
      .map(r => s"'${r.name}', `__v_${r.name}`").mkString(", ")
    row.select(
        expr(s"stack(${rules.size}, $pairs) AS (rule, n_violations)"),
        col("__n").as("n_rows"))
      .withColumn("violation_rate",
        round(col("n_violations").cast("double")
          / greatest(col("n_rows"), lit(1L)).cast("double"), 6))
  }

  /** Expect-or-fail: evaluate the audit (bounded collect) and throw —
    * naming every rule over its tolerance — unless all pass. Returns
    * `df` unchanged for chaining. */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rates = audit(df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val broken = rules.filter(r => rates(r.name)._2 > r.tolerance)
    if (broken.nonEmpty) throw new IllegalStateException(
      "expectations violated: " + broken.map { r =>
        val (n, rate) = rates(r.name)
        f"${r.name} ($n rows, rate $rate%.6f > tol ${r.tolerance}%.6f)"
      }.mkString("; "))
    df
  }
}
