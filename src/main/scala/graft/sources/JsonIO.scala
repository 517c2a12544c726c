package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** JSON-lines sink/source with DECLARED schemas — the Kafka-shape import
  * tier (reference import/.../FlinkCommitsToKafka.java writes typed JSON
  * with an explicit schema; consumers read with the same declared schema,
  * never inference).
  *
  * Schema-on-read comes from the entity encoder: a reader never infers
  * (inference would scan the data once extra and can silently widen
  * types), which is also the 100 TB posture — schema inference over a
  * large JSON lake is a full extra pass. */
object JsonIO {

  /** Write a typed dataset as JSON lines (one object per line). */
  def write[T](ds: Dataset[T], path: String): Unit =
    ds.write.mode("overwrite").json(path)

  /** Read JSON lines with the entity's declared schema. Malformed rows
    * fail loudly (FAILFAST) — an import tier must not drop data silently. */
  def read[T <: Product: Encoder](spark: SparkSession, path: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    spark.read
      .schema(enc.schema)
      .option("mode", "FAILFAST")
      .json(path)
      .as(enc)
  }

  def readCommits(spark: SparkSession, path: String): Dataset[Commit] =
    read[Commit](spark, path)(Encoders.product[Commit])

  def readEmails(spark: SparkSession, path: String): Dataset[Email] =
    read[Email](spark, path)(Encoders.product[Email])

  def readPulls(spark: SparkSession, path: String): Dataset[PullRequest] =
    read[PullRequest](spark, path)(Encoders.product[PullRequest])
}
