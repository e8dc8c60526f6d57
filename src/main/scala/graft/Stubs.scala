package graft

/** Placeholder registries — filled in as each subsystem lands. */
object FunctionQueries { val queries: Map[String, GQuery] = Map.empty }
object StreamingQueries { val queries: Map[String, GQuery] = Map.empty }
