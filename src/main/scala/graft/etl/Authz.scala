package graft.etl

/** Authorization-resource service seam — the reference registers one
  * Keycloak authz resource per study at publish time (reference:
  * clients/KeycloakClient.scala:28-50, trait clients/inf/IKeycloak
  * .scala). Driver-side, not a Spark op; the trait keeps the engine
  * testable with a deterministic in-memory double, like the id-server
  * and dictionary seams.
  */
trait Authz {
  /** Ensure one resource per study id; returns study id → resource id. */
  def ensureResources(studyIds: Seq[String]): Map[String, String]
}

/** Deterministic fixture implementation. */
final case class InMemoryAuthz(prefix: String = "res") extends Authz {
  private val created = scala.collection.mutable.LinkedHashMap[String, String]()
  override def ensureResources(studyIds: Seq[String]): Map[String, String] = {
    studyIds.foreach { s =>
      created.getOrElseUpdate(s, s"${prefix}_$s")
    }
    created.filter { case (k, _) => studyIds.contains(k) }.toMap
  }
  def all: Map[String, String] = created.toMap
}
