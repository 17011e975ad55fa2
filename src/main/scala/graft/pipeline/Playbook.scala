package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sifter's playbook composition model (playbook/load.go:26-37,
  * playbook/execute.go:294-331) as a small Scala DSL: named inputs,
  * named pipelines that `from` an input or another pipeline, named
  * outputs. Resolution is the same one-pass wiring the reference does —
  * but the "dataflow graph" here is just lazy DataFrame composition, so
  * Catalyst sees one whole plan per output (cross-pipeline pushdown and
  * pruning happen for free; the reference's channels kept every
  * operator edge a materialization boundary).
  */
final case class Pipeline(from: String, steps: Seq[(String, DataFrame => DataFrame)]) {
  def apply(input: DataFrame): DataFrame =
    steps.foldLeft(input) { case (df, (_, f)) => f(df) }
}

final case class Playbook(
    inputs: Map[String, SparkSession => DataFrame],
    pipelines: Map[String, Pipeline],
    outputs: Map[String, (String, DataFrame => Unit)]) {

  /** Resolve a pipeline (or raw input) to its composed DataFrame.
    * Detects `from` cycles (the reference's self-loop check,
    * playbook/execute.go:297-302). */
  def resolve(spark: SparkSession, name: String,
      seen: Set[String] = Set.empty): DataFrame = {
    require(!seen(name), s"pipeline cycle through '$name'")
    pipelines.get(name) match {
      case Some(p) => p(resolve(spark, p.from, seen + name))
      case None => inputs.getOrElse(name,
        sys.error(s"unknown input or pipeline: $name"))(spark)
    }
  }

  /** Materialize every output; returns each output's DataFrame. */
  def run(spark: SparkSession): Map[String, DataFrame] =
    outputs.map { case (oname, (src, sink)) =>
      val df = resolve(spark, src)
      sink(df)
      oname -> df
    }
}
