package graft

/** Registry aliases for the implementation objects. */
object FunctionQueries { val queries: Map[String, GQuery] = FunctionQueriesImpl.queries }
object StreamingQueries { val queries: Map[String, GQuery] = StreamingQueriesImpl.queries }
