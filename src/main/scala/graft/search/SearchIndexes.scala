package graft.search

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Named search-index registry — the engine's analog of the reference's
  * schema-held vector/fulltext index definitions
  * (`/root/reference/pkg/cypher/call_index_mgmt.go`,
  * `call_compat.go:344-520`): `db.index.vector.createNodeIndex` /
  * `db.index.fulltext.createNodeIndex` register a definition here, and the
  * `db.index.*.query*` procedures resolve it by name.
  *
  * A definition holds a THUNK producing the indexed (id, value) DataFrame,
  * not a materialized frame: node-property indexes must see the CURRENT
  * store snapshot at query time (the reference re-reads storage per call),
  * and dataset-backed indexes (a parquet embedding table) stay lazy so
  * Catalyst prunes/pushes into the scan. Nothing is collected; an "index"
  * at 100 TB is a partition layout hint, the query itself is the same
  * distributed plan either way.
  */
object SearchIndexes {

  /** Vector index: `df()` yields (idCol, embCol ARRAY<numeric>). */
  final case class VectorIdx(name: String, df: () => DataFrame,
      idCol: String, embCol: String, entity: String = "NODE",
      label: String = "", property: String = "",
      dimension: Int = 0, similarity: String = "cosine")

  /** Fulltext index: `df()` yields (idCol, textCol STRING). */
  final case class FulltextIdx(name: String, df: () => DataFrame,
      idCol: String, textCol: String, entity: String = "NODE",
      labels: Seq[String] = Nil, properties: Seq[String] = Nil)

  private val vectors = TrieMap.empty[String, VectorIdx]
  private val fulltexts = TrieMap.empty[String, FulltextIdx]

  def registerVector(idx: VectorIdx): VectorIdx = { vectors.put(idx.name, idx); idx }
  def registerFulltext(idx: FulltextIdx): FulltextIdx = { fulltexts.put(idx.name, idx); idx }

  def vector(name: String): VectorIdx = vectors.getOrElse(name,
    throw new IllegalArgumentException(
      s"there is no such vector index: $name (have: ${vectors.keys.toSeq.sorted.mkString(", ")})"))
  def fulltext(name: String): FulltextIdx = fulltexts.getOrElse(name,
    throw new IllegalArgumentException(
      s"there is no such fulltext schema index: $name (have: ${fulltexts.keys.toSeq.sorted.mkString(", ")})"))

  def dropVector(name: String): Boolean = vectors.remove(name).isDefined
  def dropFulltext(name: String): Boolean = fulltexts.remove(name).isDefined

  def listVectors: Seq[VectorIdx] = vectors.values.toSeq.sortBy(_.name)
  def listFulltexts: Seq[FulltextIdx] = fulltexts.values.toSeq.sortBy(_.name)
}
