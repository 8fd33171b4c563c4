package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store (s3a) configuration seam — the conf-only counterpart
  * of the reference's dev-mode session wiring
  * (reference commands/SparkConfig.scala:21-26: endpoint, path-style
  * access, access/secret key set on the Hadoop configuration).
  *
  * Pure config builder: [[ObjectStoreConf.confMap]] is a plain
  * key→value map, unit-testable with no network and no live session;
  * [[ObjectStoreConf.applyTo]] copies it onto a session's Hadoop
  * configuration the same way the reference does. Credentials are
  * parameters, never literals — pass them from the deployment's
  * secret mechanism. At 100 TB the part that matters is
  * `fs.s3a.connection.maximum` and the committer: defaults here keep
  * the magic committer on for direct-to-store writes (no rename
  * commit, which an object store cannot do atomically) and size the
  * connection pool for wide executors; both overridable via `extra`.
  */
final case class ObjectStoreConf(
    endpoint: String,
    accessKey: String,
    secretKey: String,
    pathStyleAccess: Boolean = true,
    connectionMaximum: Int = 96,
    magicCommitter: Boolean = true,
    extra: Map[String, String] = Map.empty) {

  /** The Hadoop conf entries this seam manages, fully resolved. */
  def confMap: Map[String, String] = Map(
    "fs.s3a.endpoint" -> endpoint,
    "fs.s3a.access.key" -> accessKey,
    "fs.s3a.secret.key" -> secretKey,
    "fs.s3a.path.style.access" -> pathStyleAccess.toString,
    "fs.s3a.connection.maximum" -> connectionMaximum.toString,
    "fs.s3a.committer.magic.enabled" -> magicCommitter.toString
  ) ++ extra

  /** Set every managed entry on the session's Hadoop configuration
    * (the reference's mechanism, SparkConfig.scala:21-26). Returns the
    * session for chaining. */
  def applyTo(spark: SparkSession): SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    confMap.foreach { case (k, v) => hc.set(k, v) }
    spark
  }
}

object ObjectStoreConf {
  /** The reference's local-dev preset (SparkConfig.scala:21-26):
    * a MinIO endpoint on localhost with path-style access. */
  def devDefaults: ObjectStoreConf = ObjectStoreConf(
    endpoint = "http://localhost:9000",
    accessKey = "minio",
    secretKey = "minio123")
}
