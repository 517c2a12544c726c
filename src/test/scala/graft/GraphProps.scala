package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}

import graft.operators.Graph

/** Property checks for distributed PageRank: the per-iteration
  * shuffle/join/update pipeline must reproduce EXACTLY the sequential
  * integer-arithmetic fixpoint (truncating BIGINT division, 85/100
  * damping) on arbitrary symmetric graphs — the same bit-exactness
  * standard the DuckDB unrolled-iteration oracle enforces at query
  * level, here exercised over random topologies, duplicate edges and
  * self-loops. */
object GraphProps extends Properties("PageRank") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(8)

  private val Scale = 1000000L

  /** Driver-side reference: the identical integer update, sequentially.
    * Scala's `/` on non-negative longs is the same truncating division
    * as Spark's DIV and DuckDB's //. */
  private def refPageRank(edges: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val verts = e.flatMap { case (a, b) => Seq(a, b) }.distinct
    val teleport = Scale * 15 / 100
    var rank = verts.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val contrib = rank.map { case (v, r) => v -> r / deg(v) }
      val in = e.groupBy(_._2).map { case (v, es) => v -> es.map(x => contrib(x._1)).sum }
      rank = verts.map(v => v -> (teleport + (in.getOrElse(v, 0L) / 100) * 85)).toMap
    }
    rank
  }

  /** Random graphs, SYMMETRIZED (the operator's no-dangling contract —
    * same preparation the shipped query does). */
  private val genSymGraph: Gen[List[(Long, Long)]] = for {
    nV <- Gen.choose(2, 30)
    nE <- Gen.choose(1, 50)
    es <- Gen.listOfN(nE, for {
      a <- Gen.choose(0L, nV.toLong - 1)
      b <- Gen.choose(0L, nV.toLong - 1) // self-loops allowed
    } yield (a, b))
  } yield es ++ es.map(_.swap)

  property("== sequential integer fixpoint on random symmetric graphs") =
    Prop.forAll(genSymGraph) { edges =>
      import TestSpark.spark
      import spark.implicits._
      val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
          iters = 2, scale = Scale)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refPageRank(edges, iters = 2)
      // exact equality AND the mass contract: truncation only loses
      // mass, so the total never exceeds n·scale
      (Prop(got == want) :| s"got=$got want=$want") &&
        Prop(got.values.sum <= got.size * Scale) :| "rank mass grew"
    }

  /** Brute-force per-vertex triangle counts (driver-side O(n·m)). */
  private def refTriangles(edges: List[(Long, Long)]): Map[Long, Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val verts = e.flatMap { case (a, b) => Seq(a, b) }.toList.sorted
    val tris = for {
      (a, b) <- e.toList
      c <- verts if c > b && e.contains((a, c)) && e.contains((b, c))
    } yield (a, b, c)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  property("triangleCounts == brute force (self-loops, dup edges, any orientation)") =
    Prop.forAll(genSymGraph) { edges =>
      import TestSpark.spark
      import spark.implicits._
      val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refTriangles(edges)
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("a dangling vertex (no out-edges) is rejected loudly") = {
    import TestSpark.spark
    import spark.implicits._
    val directed = List((1L, 2L), (2L, 3L)) // 3 has no out-edge
    Prop.throws(classOf[IllegalArgumentException]) {
      Graph.pageRank(directed.toDF("src", "dst"), "src", "dst", iters = 1)
    }
  }
}
