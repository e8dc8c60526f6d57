package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Cypher

/** The reference's Mimir exact-query expectations, asserted against the
  * VERBATIM index-api.ts queries (`mimir_exact_test.go`) — including the
  * raw COLLECT(DISTINCT …) form the registry row replaces with a sorted
  * join for hashing.
  */
class MimirSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val g = MimirFixture.graph(spark, sf)

  test("exact Mimir stats query: 10 files, 10 chunks, 12 embeddings") {
    val r = Cypher.run(g,
      """MATCH (f:File)
         OPTIONAL MATCH (f)-[:HAS_CHUNK]->(c:FileChunk)
         WITH f, c,
           CASE WHEN c IS NOT NULL AND c.embedding IS NOT NULL THEN 1 ELSE 0 END AS chunkHasEmbedding,
           CASE WHEN f.embedding IS NOT NULL THEN 1 ELSE 0 END AS fileHasEmbedding
         WITH
           COUNT(DISTINCT f) AS totalFiles,
           COUNT(DISTINCT c) AS totalChunks,
           SUM(chunkHasEmbedding) + SUM(fileHasEmbedding) AS totalEmbeddings,
           COLLECT(DISTINCT f.extension) AS extensions
         RETURN totalFiles, totalChunks, totalEmbeddings, extensions""").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 10L, "totalFiles")
    assert(r(0).getLong(1) == 10L, "totalChunks")
    assert(r(0).getLong(2) == 12L, "totalEmbeddings (3 files x 2 chunk rows + 6 chunks)")
    assert(r(0).getSeq[String](3).toSet == Set(".md", ".ts", ".js"))
  }

  test("exact Mimir extension query: .md=8 .ts=1 .js=1") {
    val got = Cypher.run(g,
      """MATCH (f:File)
         WHERE f.extension IS NOT NULL
         WITH f.extension AS ext, COUNT(f) AS count
         RETURN ext, count
         ORDER BY count DESC""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(".md" -> 8L, ".ts" -> 1L, ".js" -> 1L))
  }

  test("exact Mimir byType query: File label filtered, Node=10") {
    val got = Cypher.run(g,
      """MATCH (f:File)
         WITH f, [label IN labels(f) WHERE label <> 'File'] AS filteredLabels
         UNWIND filteredLabels AS label
         WITH label, COUNT(f) AS count
         RETURN label AS type, count
         ORDER BY count DESC""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("Node" -> 10L))
    assert(!got.contains("File"))
  }

  test("stats query without chunks/embeddings returns zero counts") {
    // the first mimir_exact_test fixture: files only — the OPTIONAL MATCH
    // leg is all-null and the flag sums are 0, not null
    val got = Cypher.run(g,
      """MATCH (f:File) WHERE f.key > 5
         OPTIONAL MATCH (f)-[:HAS_CHUNK]->(c:FileChunk)
         WITH f, c,
           CASE WHEN c IS NOT NULL AND c.embedding IS NOT NULL THEN 1 ELSE 0 END AS chunkHasEmbedding,
           CASE WHEN f.embedding IS NOT NULL THEN 1 ELSE 0 END AS fileHasEmbedding
         WITH COUNT(DISTINCT f) AS totalFiles, COUNT(DISTINCT c) AS totalChunks,
              SUM(chunkHasEmbedding) + SUM(fileHasEmbedding) AS totalEmbeddings
         RETURN totalFiles, totalChunks, totalEmbeddings""").collect()
    assert(got(0).getLong(0) == 5L && got(0).getLong(1) == 0L && got(0).getLong(2) == 0L)
  }
}
