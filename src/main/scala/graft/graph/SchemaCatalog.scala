package graft.graph

import scala.collection.concurrent.TrieMap

/** Schema metadata catalog (SURVEY §2.9 Schema DDL — the reference's
  * `SchemaManager`, `pkg/storage/schema.go:42-56`: unique constraints plus
  * property/composite/fulltext/vector/range indexes;
  * DDL parsed at `pkg/cypher/schema.go:19`, SHOW at `executor_show.go`).
  *
  * In this engine an index is a physical-layout HINT: Catalyst predicate
  * pushdown / partition pruning already give index-seek behavior on the
  * label-partitioned parquet (SURVEY §4), so CREATE INDEX records intent
  * (and documents the layout a 100 TB deployment would bucket/sort by).
  * Constraints are ENFORCED: [[GraphStore.createNodes]]/mergeNodes check
  * unique constraints before the snapshot swap.
  */
final class SchemaCatalog {

  case class IndexDef(name: String, kind: String, label: String, properties: Seq[String])
  case class ConstraintDef(name: String, kind: String, label: String, properties: Seq[String])

  private val indexes = TrieMap.empty[String, IndexDef]
  private val constraints = TrieMap.empty[String, ConstraintDef]

  def createIndex(name: String, kind: String, label: String, props: Seq[String]): Unit = {
    require(!indexes.contains(name), s"index $name already exists")
    indexes.put(name, IndexDef(name, kind, label, props))
  }

  def dropIndex(name: String): Unit =
    require(indexes.remove(name).isDefined, s"no such index $name")

  def createConstraint(name: String, kind: String, label: String, props: Seq[String]): Unit = {
    require(!constraints.contains(name), s"constraint $name already exists")
    constraints.put(name, ConstraintDef(name, kind, label, props))
  }

  def dropConstraint(name: String): Unit =
    require(constraints.remove(name).isDefined, s"no such constraint $name")

  def listIndexes: Seq[IndexDef] = indexes.values.toSeq.sortBy(_.name)
  def listConstraints: Seq[ConstraintDef] = constraints.values.toSeq.sortBy(_.name)
  def uniqueConstraints: Seq[ConstraintDef] =
    listConstraints.filter(_.kind == "UNIQUE")
}
