package graft.sources

import org.apache.spark.sql.SparkSession

/** RGW (Ceph object gateway) connectivity for the `s3a://` paths
  * ObjectSources reads in production — the engine-side equivalent of the
  * reference's boto3 client setup (`s3vectors-app/pythonvectordbceph.py:49-77`:
  * `endpoint_url` from BUCKET_HOST/BUCKET_PORT, keys from the
  * bucket-claim secret, region required-but-unused).
  *
  * Hadoop S3A needs four things RGW deployments always set:
  * endpoint, credentials, path-style addressing (RGW buckets are not DNS
  * subdomains), and plain-HTTP when the gateway terminates without TLS —
  * exactly the knobs boto3 derives from the reference's env. `apply` sets
  * them on the session's Hadoop conf; `fromEnv` reads the same variable
  * names the reference's deployment injects
  * (`s3vectors-app/README.md:374-378`), so a pod spec written for the
  * reference configures this engine unchanged.
  *
  * No network leaves this sandbox, so the wiring is exercised at the
  * conf layer (RgwConfigSpec); against a live RGW the same session then
  * reads `s3a://bucket/prefix` through every ObjectSources scan. */
final case class RgwConfig(endpoint: String, accessKey: String, secretKey: String,
                           pathStyle: Boolean = true) {

  def ssl: Boolean = endpoint.startsWith("https://")

  /** Apply to the session (global Hadoop conf — all s3a paths). */
  def apply(spark: SparkSession): Unit =
    set(identity)(spark.sparkContext.hadoopConfiguration.set)

  /** Apply for ONE bucket only (S3A per-bucket override keys) — several
    * gateways/credential sets can coexist in one session, the shape of the
    * reference's two clients (`s3` vs `s3vectors`, pythonvectordbceph.py:53,72). */
  def applyForBucket(spark: SparkSession, bucket: String): Unit =
    set(k => k.replace("fs.s3a.", s"fs.s3a.bucket.$bucket."))(
      spark.sparkContext.hadoopConfiguration.set)

  private def set(key: String => String)(put: (String, String) => Unit): Unit = {
    put(key("fs.s3a.endpoint"), endpoint)
    put(key("fs.s3a.access.key"), accessKey)
    put(key("fs.s3a.secret.key"), secretKey)
    put(key("fs.s3a.path.style.access"), pathStyle.toString)
    put(key("fs.s3a.connection.ssl.enabled"), ssl.toString)
  }
}

object RgwConfig {

  /** The reference deployment's environment contract
    * (`pythonvectordbceph.py:49-60`): endpoint assembled from
    * BUCKET_HOST:BUCKET_PORT (http assumed, as the reference's comment
    * admits), credentials from AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY. */
  def fromEnv(env: Map[String, String] = sys.env): Option[RgwConfig] =
    for {
      host <- env.get("BUCKET_HOST")
      access <- env.get("AWS_ACCESS_KEY_ID")
      secret <- env.get("AWS_SECRET_ACCESS_KEY")
    } yield RgwConfig(
      s"http://$host:${env.getOrElse("BUCKET_PORT", "80")}", access, secret)
}
