package graft

/** Driver-facing query registry: one entry per SURVEY §2 operator (plus
  * the training-pipeline extensions), each with a DuckDB oracle where the
  * semantics are SQL-expressible. The 191 entries live in per-family
  * files under `graft/queries/` (QueriesCore, QueriesText, QueriesDedup,
  * QueriesAnn, QueriesModel, QueriesMixture, QueriesEvents,
  * QueriesRelational, QueriesGraph); shared helpers in [[QueryHelpers]].
  *
  * Conventions shared by the Spark plan and the oracle SQL so the
  * driver's column-sorted value-hash comparison is stable:
  *  - identical output column names on both sides;
  *  - DOUBLE outputs rounded (4-6 decimals) to absorb summation-order
  *    float noise, via the engine-portable floor(x*10^n + 0.5)/10^n in
  *    BOTH plans (engine round() primitives disagree on manufactured
  *    fp ties — observed 1/100k rows at sf0.1);
  *  - timestamps exported as BIGINT epoch seconds of a date_trunc
  *    (engine timestamp precision — ns vs µs — never leaks);
  *  - every ranking gets a deterministic tiebreak;
  *  - DuckDB integer SUMs cast back to BIGINT (DuckDB widens to HUGEINT).
  */
object Queries {

  val all: Seq[Q] = QueriesCore.qs ++
    QueriesText.qs ++
    QueriesDedup.qs ++
    QueriesAnn.qs ++
    QueriesModel.qs ++
    QueriesMixture.qs ++
    QueriesEvents.qs ++
    QueriesRelational.qs ++
    QueriesGraph.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
