package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Window

/** One-shot audit: which registered queries plan a Window with an EMPTY
  * partition spec (all rows to one task)? Deliberate uses exist (rank
  * over an already-reduced frame: sweeps, query×doc score grids); this
  * lists them all so each can be adjudicated. Only the returned plan is
  * inspected — no `collect`/`count` here — but CONSTRUCTING some queries
  * executes work eagerly (gate rows replay their memoized streams,
  * index rows build their on-disk artifacts), which is why this runs at
  * sf0.001 and a stream stall can surface as [audit-error]. */
object DebugWindowAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val globals = plan.collect {
          case w: Window if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString(", ").take(120)
        }
        if (globals.nonEmpty)
          println(s"[global-window] $name :: ${globals.mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"[audit-error] $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    spark.stop()
  }
}
