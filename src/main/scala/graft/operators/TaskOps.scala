package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Task-lifecycle semantics shared by the MCP `task`/`tasks` tools and
  * their oracle replay (`/root/reference/pkg/mcp/server.go:784-1022`):
  *   - status auto-toggle pending→active→completed (server.go:806-813;
  *     completed/blocked stay put without an explicit status);
  *   - the `unblocked_only` filter: a task is blocked while any
  *     DEPENDS_ON target is not completed (the reference's NOT EXISTS
  *     subquery, server.go:963-969 — here an anti-join so the filter
  *     stays distributed at any task count).
  */
object TaskOps {

  /** One auto-toggle step of the status lifecycle. */
  def toggled(status: Column): Column =
    when(status === "pending" || status === "", lit("active"))
      .when(status === "active", lit("completed"))
      .otherwise(status)

  /** Ids (column `id`) of tasks blocked by an incomplete dependency.
    * `deps` carries (src, dst) DEPENDS_ON pairs; `tasks` carries
    * (id, status).
    */
  def blockedIds(tasks: DataFrame, deps: DataFrame): DataFrame =
    deps.join(
        tasks.filter(col("status") =!= "completed").select(col("id").as("dst")),
        Seq("dst"))
      .select(col("src").as("id")).distinct()

  /** Tasks with no incomplete dependency (anti-join on the blocked set). */
  def unblockedOnly(tasks: DataFrame, deps: DataFrame): DataFrame =
    tasks.join(blockedIds(tasks, deps), Seq("id"), "left_anti")
}
