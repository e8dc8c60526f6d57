package graft

/** Placeholder registries — filled in as each subsystem lands. */
object SearchQueries { val queries: Map[String, GQuery] = Map.empty }
object AlgoQueries { val queries: Map[String, GQuery] = Map.empty }
object PipelineQueries { val queries: Map[String, GQuery] = Map.empty }
object FunctionQueries { val queries: Map[String, GQuery] = Map.empty }
object StreamingQueries { val queries: Map[String, GQuery] = Map.empty }
