package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `SHOW PROCEDURES` / `SHOW FUNCTIONS` catalogs — the reference serves
  * CURATED static tables here (`/root/reference/pkg/cypher/
  * executor_show.go:33-161`), not its full registry (the long tail is
  * `apoc.help` / `apoc.meta.procedures` territory, same as this engine).
  * The names, signature strings, and descriptions are that compatibility
  * contract verbatim — a Neo4j-browser-style UI renders them directly —
  * and every listed name is served by this engine's CALL/function
  * surface (ApocCatalogSpec + the planner registry back the claim).
  */
object ShowCatalog {

  /** (name, signature, description, mode, worksOnSystem) —
    * executor_show.go:36-65.
    */
  val procedures: Seq[(String, String, String, String, Boolean)] = Seq(
    ("db.labels", "db.labels() :: (label :: STRING)", "Lists all labels in the database", "READ", false),
    ("db.relationshipTypes", "db.relationshipTypes() :: (relationshipType :: STRING)", "Lists all relationship types in the database", "READ", false),
    ("db.propertyKeys", "db.propertyKeys() :: (propertyKey :: STRING)", "Lists all property keys in the database", "READ", false),
    ("db.indexes", "db.indexes() :: (name :: STRING, state :: STRING, ...)", "Lists all indexes in the database", "READ", false),
    ("db.constraints", "db.constraints() :: (name :: STRING, ...)", "Lists all constraints in the database", "READ", false),
    ("db.info", "db.info() :: (id :: STRING, name :: STRING, creationDate :: STRING)", "Database information", "READ", false),
    ("db.ping", "db.ping() :: (success :: BOOLEAN)", "Database ping", "READ", false),
    ("db.schema.visualization", "db.schema.visualization() :: (...)", "Database schema visualization", "READ", false),
    ("db.schema.nodeTypeProperties", "db.schema.nodeTypeProperties() :: (...)", "Node type properties", "READ", false),
    ("db.schema.relTypeProperties", "db.schema.relTypeProperties() :: (...)", "Relationship type properties", "READ", false),
    ("db.index.fulltext.queryNodes", "db.index.fulltext.queryNodes(indexName :: STRING, query :: STRING) :: (node :: NODE, score :: FLOAT)", "Fulltext search on nodes", "READ", false),
    ("db.index.fulltext.queryRelationships", "db.index.fulltext.queryRelationships(indexName :: STRING, query :: STRING) :: (relationship :: RELATIONSHIP, score :: FLOAT)", "Fulltext search on relationships", "READ", false),
    ("db.index.vector.queryNodes", "db.index.vector.queryNodes(indexName :: STRING, numberOfResults :: INTEGER, query :: LIST<FLOAT>) :: (node :: NODE, score :: FLOAT)", "Vector similarity search on nodes", "READ", false),
    ("db.index.vector.queryRelationships", "db.index.vector.queryRelationships(...) :: (...)", "Vector similarity search on relationships", "READ", false),
    ("dbms.components", "dbms.components() :: (name :: STRING, versions :: LIST<STRING>, edition :: STRING)", "DBMS components", "DBMS", false),
    ("dbms.procedures", "dbms.procedures() :: (name :: STRING, ...)", "List all procedures", "DBMS", false),
    ("dbms.functions", "dbms.functions() :: (name :: STRING, ...)", "List all functions", "DBMS", false),
    ("dbms.info", "dbms.info() :: (id :: STRING, name :: STRING, creationDate :: STRING)", "DBMS information", "DBMS", false),
    ("dbms.listConfig", "dbms.listConfig() :: (name :: STRING, ...)", "List DBMS configuration", "DBMS", false),
    ("dbms.clientConfig", "dbms.clientConfig() :: (name :: STRING, value :: ANY)", "Client configuration", "DBMS", false),
    ("dbms.listConnections", "dbms.listConnections() :: (...)", "List active connections", "DBMS", false),
    ("apoc.path.subgraphNodes", "apoc.path.subgraphNodes(startNode :: NODE, config :: MAP) :: (node :: NODE)", "Return all nodes in a subgraph", "READ", false),
    ("apoc.path.expand", "apoc.path.expand(startNode :: NODE, relationshipFilter :: STRING, labelFilter :: STRING, minLevel :: INTEGER, maxLevel :: INTEGER) :: (path :: PATH)", "Expand paths from start node", "READ", false),
    ("apoc.path.spanningTree", "apoc.path.spanningTree(startNode :: NODE, config :: MAP) :: (path :: PATH)", "Return spanning tree from start node", "READ", false),
    ("nornicdb.version", "nornicdb.version() :: (version :: STRING)", "NornicDB version", "READ", false),
    ("nornicdb.stats", "nornicdb.stats() :: (...)", "NornicDB statistics", "READ", false),
    ("nornicdb.decay.info", "nornicdb.decay.info() :: (...)", "NornicDB decay information", "READ", false))

  /** (name, signature, description, aggregating) —
    * executor_show.go:73-161 (isBuiltIn/argumentDescription are false
    * for every row in the reference; emitted as literal columns).
    */
  val functions: Seq[(String, String, String, Boolean)] = Seq(
    ("id", "id(entity :: ANY) :: INTEGER", "Returns the id of a node or relationship", false),
    ("elementId", "elementId(entity :: ANY) :: STRING", "Returns the element id of a node or relationship", false),
    ("labels", "labels(node :: NODE) :: LIST<STRING>", "Returns labels of a node", false),
    ("type", "type(relationship :: RELATIONSHIP) :: STRING", "Returns the type of a relationship", false),
    ("keys", "keys(entity :: ANY) :: LIST<STRING>", "Returns the property keys of a node or relationship", false),
    ("properties", "properties(entity :: ANY) :: MAP", "Returns all properties of a node or relationship", false),
    ("coalesce", "coalesce(expression :: ANY...) :: ANY", "Returns first non-null value", false),
    ("head", "head(list :: LIST<ANY>) :: ANY", "Returns the first element of a list", false),
    ("last", "last(list :: LIST<ANY>) :: ANY", "Returns the last element of a list", false),
    ("tail", "tail(list :: LIST<ANY>) :: LIST<ANY>", "Returns all but the first element of a list", false),
    ("size", "size(list :: LIST<ANY>) :: INTEGER", "Returns the number of elements in a list", false),
    ("length", "length(path :: PATH) :: INTEGER", "Returns the length of a path", false),
    ("reverse", "reverse(original :: LIST<ANY> | STRING) :: LIST<ANY> | STRING", "Reverses a list or string", false),
    ("range", "range(start :: INTEGER, end :: INTEGER, step :: INTEGER = 1) :: LIST<INTEGER>", "Returns a list of integers", false),
    ("toString", "toString(expression :: ANY) :: STRING", "Converts expression to string", false),
    ("toInteger", "toInteger(expression :: ANY) :: INTEGER", "Converts expression to integer", false),
    ("toFloat", "toFloat(expression :: ANY) :: FLOAT", "Converts expression to float", false),
    ("toBoolean", "toBoolean(expression :: ANY) :: BOOLEAN", "Converts expression to boolean", false),
    ("toLower", "toLower(original :: STRING) :: STRING", "Converts string to lowercase", false),
    ("toUpper", "toUpper(original :: STRING) :: STRING", "Converts string to uppercase", false),
    ("trim", "trim(original :: STRING) :: STRING", "Trims whitespace from string", false),
    ("ltrim", "ltrim(original :: STRING) :: STRING", "Trims leading whitespace", false),
    ("rtrim", "rtrim(original :: STRING) :: STRING", "Trims trailing whitespace", false),
    ("replace", "replace(original :: STRING, search :: STRING, replace :: STRING) :: STRING", "Replaces all occurrences", false),
    ("split", "split(original :: STRING, splitDelimiter :: STRING) :: LIST<STRING>", "Splits string by delimiter", false),
    ("substring", "substring(original :: STRING, start :: INTEGER, length :: INTEGER = NULL) :: STRING", "Returns substring", false),
    ("left", "left(original :: STRING, length :: INTEGER) :: STRING", "Returns left part of string", false),
    ("right", "right(original :: STRING, length :: INTEGER) :: STRING", "Returns right part of string", false),
    ("abs", "abs(expression :: NUMBER) :: NUMBER", "Returns absolute value", false),
    ("ceil", "ceil(expression :: FLOAT) :: INTEGER", "Returns ceiling value", false),
    ("floor", "floor(expression :: FLOAT) :: INTEGER", "Returns floor value", false),
    ("round", "round(expression :: FLOAT) :: INTEGER", "Rounds to nearest integer", false),
    ("sign", "sign(expression :: NUMBER) :: INTEGER", "Returns sign of number", false),
    ("sqrt", "sqrt(expression :: FLOAT) :: FLOAT", "Returns square root", false),
    ("rand", "rand() :: FLOAT", "Returns random float between 0 and 1", false),
    ("randomUUID", "randomUUID() :: STRING", "Returns a random UUID", false),
    ("sin", "sin(expression :: FLOAT) :: FLOAT", "Returns sine", false),
    ("cos", "cos(expression :: FLOAT) :: FLOAT", "Returns cosine", false),
    ("tan", "tan(expression :: FLOAT) :: FLOAT", "Returns tangent", false),
    ("log", "log(expression :: FLOAT) :: FLOAT", "Returns natural logarithm", false),
    ("log10", "log10(expression :: FLOAT) :: FLOAT", "Returns base-10 logarithm", false),
    ("exp", "exp(expression :: FLOAT) :: FLOAT", "Returns e raised to power", false),
    ("pi", "pi() :: FLOAT", "Returns pi constant", false),
    ("e", "e() :: FLOAT", "Returns Euler's number", false),
    ("timestamp", "timestamp() :: INTEGER", "Returns current timestamp in milliseconds", false),
    ("datetime", "datetime(input :: ANY = NULL) :: DATETIME", "Creates a datetime", false),
    ("date", "date(input :: ANY = NULL) :: DATE", "Creates a date", false),
    ("time", "time(input :: ANY = NULL) :: TIME", "Creates a time", false),
    ("count", "count(expression :: ANY) :: INTEGER", "Returns count", true),
    ("sum", "sum(expression :: NUMBER) :: NUMBER", "Returns sum", true),
    ("avg", "avg(expression :: NUMBER) :: FLOAT", "Returns average", true),
    ("min", "min(expression :: ANY) :: ANY", "Returns minimum", true),
    ("max", "max(expression :: ANY) :: ANY", "Returns maximum", true),
    ("collect", "collect(expression :: ANY) :: LIST<ANY>", "Collects values into list", true),
    ("exists", "exists(expression :: ANY) :: BOOLEAN", "Returns true if expression is not null", false),
    ("isEmpty", "isEmpty(list :: LIST<ANY> | MAP | STRING) :: BOOLEAN", "Returns true if empty", false),
    ("all", "all(variable IN list WHERE predicate) :: BOOLEAN", "Returns true if all match", false),
    ("any", "any(variable IN list WHERE predicate) :: BOOLEAN", "Returns true if any match", false),
    ("none", "none(variable IN list WHERE predicate) :: BOOLEAN", "Returns true if none match", false),
    ("single", "single(variable IN list WHERE predicate) :: BOOLEAN", "Returns true if exactly one matches", false),
    ("point", "point(input :: MAP) :: POINT", "Creates a point", false),
    ("distance", "distance(point1 :: POINT, point2 :: POINT) :: FLOAT", "Returns distance between points", false),
    ("polygon", "polygon(points :: LIST<POINT>) :: POLYGON", "Creates a polygon from a list of points", false),
    ("lineString", "lineString(points :: LIST<POINT>) :: LINESTRING", "Creates a lineString from a list of points", false),
    ("point.intersects", "point.intersects(point :: POINT, polygon :: POLYGON) :: BOOLEAN", "Checks if point intersects with polygon", false),
    ("point.contains", "point.contains(polygon :: POLYGON, point :: POINT) :: BOOLEAN", "Checks if polygon contains point", false),
    ("vector.similarity.cosine", "vector.similarity.cosine(vector1 :: LIST<FLOAT>, vector2 :: LIST<FLOAT>) :: FLOAT", "Cosine similarity", false),
    ("vector.similarity.euclidean", "vector.similarity.euclidean(vector1 :: LIST<FLOAT>, vector2 :: LIST<FLOAT>) :: FLOAT", "Euclidean similarity", false),
    ("kalman.init", "kalman.init(config? :: MAP) :: STRING", "Create new Kalman filter state (basic scalar filter for noise smoothing)", false),
    ("kalman.process", "kalman.process(measurement :: FLOAT, state :: STRING, target? :: FLOAT) :: MAP", "Process measurement, returns {value, state}", false),
    ("kalman.predict", "kalman.predict(state :: STRING, steps :: INTEGER) :: FLOAT", "Predict state n steps into the future", false),
    ("kalman.state", "kalman.state(state :: STRING) :: FLOAT", "Get current state estimate from state JSON", false),
    ("kalman.reset", "kalman.reset(state :: STRING) :: STRING", "Reset filter state to initial values", false),
    ("kalman.velocity.init", "kalman.velocity.init(initialPos? :: FLOAT, initialVel? :: FLOAT) :: STRING", "Create 2-state Kalman filter (position + velocity for trend tracking)", false),
    ("kalman.velocity.process", "kalman.velocity.process(measurement :: FLOAT, state :: STRING) :: MAP", "Process measurement, returns {value, velocity, state}", false),
    ("kalman.velocity.predict", "kalman.velocity.predict(state :: STRING, steps :: INTEGER) :: FLOAT", "Predict position n steps into the future", false),
    ("kalman.adaptive.init", "kalman.adaptive.init(config? :: MAP) :: STRING", "Create adaptive Kalman filter (auto-switches between basic and velocity modes)", false),
    ("kalman.adaptive.process", "kalman.adaptive.process(measurement :: FLOAT, state :: STRING) :: MAP", "Process measurement, returns {value, mode, state}", false))

  def proceduresDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    procedures.toDF("name", "signature", "description", "mode", "worksOnSystem")
  }

  def functionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    functions.map { case (n, s, d, agg) => (n, s, d, agg, false, false) }
      .toDF("name", "signature", "description", "aggregating", "isBuiltIn",
        "argumentDescription")
  }
}
