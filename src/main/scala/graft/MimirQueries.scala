package graft

import org.apache.spark.sql.SparkSession

import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Mimir memory-graph workload — the reference's OTHER published test
  * family (`/root/reference/pkg/cypher/mimir_exact_test.go`: the exact
  * queries Mimir's index-api.ts runs, over File:Node / FileChunk:Node
  * graphs with HAS_CHUNK edges and embedding markers). The e2e shape
  * (mimir_exact_test.go:280-601): 10 files (8 .md, 1 .ts, 1 .js), files
  * 1-5 carry 2 chunks each, embeddings set on files 1-3 and their 6
  * chunks — so the stats query's OPTIONAL MATCH counts file embeddings
  * once per chunk row: totalEmbeddings = 6 + 6 = 12.
  */
object MimirFixture {

  private val files = Seq(
    (1, "/test/doc1.md", ".md", "doc1.md"), (2, "/test/doc2.md", ".md", "doc2.md"),
    (3, "/test/doc3.md", ".md", "doc3.md"), (4, "/test/doc4.md", ".md", "doc4.md"),
    (5, "/test/doc5.md", ".md", "doc5.md"), (6, "/test/doc6.md", ".md", "doc6.md"),
    (7, "/test/doc7.md", ".md", "doc7.md"), (8, "/test/doc8.md", ".md", "doc8.md"),
    (9, "/test/app.ts", ".ts", "app.ts"), (10, "/test/util.js", ".js", "util.js"))

  @volatile private var cached: Option[PropertyGraph] = None

  def graph(s: SparkSession, d: String): PropertyGraph = synchronized {
    cached.getOrElse {
      val base = GraphQueries.graph(s, d)
      val store = new GraphStore(PropertyGraph(
        base.nodes.filter("false").localCheckpoint(true),
        base.edges.filter("false").localCheckpoint(true)),
        registerGlobal = false)
      files.foreach { case (k, path, ext, name) =>
        CypherWrite.execute(store,
          s"CREATE (:File:Node {key: $k, path: '$path', extension: '$ext', name: '$name', content: 'content $k'})")
      }
      // files 1-5 carry 2 chunks each (keys 100+2k-1, 100+2k)
      (1 to 5).foreach { k =>
        Seq(0, 1).foreach { idx =>
          val ck = 100 + 2 * k - 1 + idx
          CypherWrite.execute(store,
            s"""CREATE (:FileChunk:Node {key: $ck, chunk_index: $idx,
               | text: 'chunk $k$idx text content', parent_file_id: 'file$k',
               | type: 'file_chunk', total_chunks: 2})""".stripMargin)
          CypherWrite.execute(store,
            s"""MATCH (f:File) WHERE f.key = $k MATCH (c:FileChunk)
               | WHERE c.key = $ck CREATE (f)-[:HAS_CHUNK {index: $idx}]->(c)""".stripMargin)
        }
      }
      // embedding markers on files 1-3 and their chunks (keys 101-106) —
      // the e2e sets an `embedding` property the IS NOT NULL checks see
      CypherWrite.execute(store,
        "MATCH (f:File) WHERE f.key <= 3 SET f.embedding = 'test-model'")
      CypherWrite.execute(store,
        "MATCH (c:FileChunk) WHERE c.key <= 106 SET c.embedding = 'test-model'")
      // read-only handoff: compact the mutation layers' accumulated
      // partitions (a 10-row frame frozen at ~86 partitions costs more
      // task scheduling than the queries it serves)
      val g = PropertyGraph(
        store.snapshot.nodes.coalesce(4).localCheckpoint(true),
        store.snapshot.edges.coalesce(4).localCheckpoint(true))
      cached = Some(g)
      g
    }
  }
}

/** The exact Mimir index-api.ts queries as oracle rows
  * (mimir_exact_test.go:56-135,503-601). The registry variant of the
  * stats query joins the extension list sorted so the row hashes
  * deterministically; MimirSpec runs the verbatim COLLECT form.
  */
object MimirQueries {
  import MimirFixture.graph

  private def q(cypher: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => Cypher.run(graph(s, d), cypher)

  val queries: Map[String, GQuery] = Map(
    // index-api.ts:642-658 — the stats query (file embeddings counted once
    // per chunk row through the OPTIONAL MATCH, the reference's own noted
    // semantics)
    "q_mimir_stats" -> GQuery(
      q("""MATCH (f:File)
           OPTIONAL MATCH (f)-[:HAS_CHUNK]->(c:FileChunk)
           WITH f, c,
             CASE WHEN c IS NOT NULL AND c.embedding IS NOT NULL THEN 1 ELSE 0 END AS chunkHasEmbedding,
             CASE WHEN f.embedding IS NOT NULL THEN 1 ELSE 0 END AS fileHasEmbedding
           WITH
             COUNT(DISTINCT f) AS totalFiles,
             COUNT(DISTINCT c) AS totalChunks,
             SUM(chunkHasEmbedding) + SUM(fileHasEmbedding) AS totalEmbeddings,
             COLLECT(DISTINCT f.extension) AS exts
           RETURN totalFiles, totalChunks, totalEmbeddings,
                  apoc.text.join(apoc.coll.sort(exts), ',') AS extensions"""),
      Some("""SELECT CAST(10 AS BIGINT) AS totalFiles, CAST(10 AS BIGINT) AS totalChunks,
                     CAST(12 AS BIGINT) AS totalEmbeddings,
                     '.js,.md,.ts' AS extensions"""), "2.9"),

    // index-api.ts:666-672 — extension histogram
    "q_mimir_extensions" -> GQuery(
      q("""MATCH (f:File)
           WHERE f.extension IS NOT NULL
           WITH f.extension AS ext, COUNT(f) AS count
           RETURN ext, count
           ORDER BY count DESC"""),
      Some("""SELECT * FROM (VALUES ('.md', CAST(8 AS BIGINT)),
                ('.ts', CAST(1 AS BIGINT)), ('.js', CAST(1 AS BIGINT))) t(ext, count)"""),
      "2.4"),

    // index-api.ts:682-689 — label histogram with the File label filtered
    // through a list comprehension + UNWIND
    "q_mimir_bytype" -> GQuery(
      q("""MATCH (f:File)
           WITH f, [label IN labels(f) WHERE label <> 'File'] AS filteredLabels
           UNWIND filteredLabels AS label
           WITH label, COUNT(f) AS count
           RETURN label AS type, count
           ORDER BY count DESC"""),
      Some("""SELECT 'Node' AS type, CAST(10 AS BIGINT) AS count"""), "2.9"),

    // chunk adjacency: files with chunk counts and embedded-chunk counts —
    // the shape Mimir's per-file progress view reads
    "q_mimir_chunk_progress" -> GQuery(
      q("""MATCH (f:File)-[:HAS_CHUNK]->(c:FileChunk)
           WITH f.name AS file, COUNT(c) AS chunks,
                SUM(CASE WHEN c.embedding IS NOT NULL THEN 1 ELSE 0 END) AS embedded
           RETURN file, chunks, embedded
           ORDER BY file"""),
      Some("""SELECT * FROM (VALUES
                ('doc1.md', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
                ('doc2.md', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
                ('doc3.md', CAST(2 AS BIGINT), CAST(2 AS BIGINT)),
                ('doc4.md', CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
                ('doc5.md', CAST(2 AS BIGINT), CAST(0 AS BIGINT)))
              t(file, chunks, embedded)"""), "2.4"))
}
