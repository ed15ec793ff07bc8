package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Funnel, Profile, Skew}
import Q._

/** Round-6 analytics surface: planned skew mitigation (salted join),
  * Markov transition matrices, and distribution-shape moments — the
  * profiling/sequence questions left open after rounds 1–5.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Salted shuffle join: events (5 hot event_type keys — maximal
    // skew: every row is one of 5 values) joined to a per-type weight
    // dim under a shuffle_hash hint (standing in for a dim too big to
    // broadcast), salt spreading each hot key over 8 reducers. The
    // oracle is the plain unsalted join — salting must be
    // result-invisible.
    Q(
      "q117_salted_join",
      (s, dir) => {
        import s.implicits._
        val weights = Seq(
          ("view", 1.0), ("click", 2.0), ("purchase", 10.0),
          ("signup", 5.0), ("error", 0.5)).toDF("event_type", "weight")
        Skew.saltedJoin(
            t(s, dir, "events"), weights.hint("shuffle_hash"),
            keys = Seq("event_type"), saltBy = Seq($"event_id"), salts = 8)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value" * $"weight").as("weighted_sum"))
          .orderBy($"event_type")
      },
      Some(s"""
        WITH w(event_type, weight) AS (VALUES
          ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
          ('signup', 5.0), ('error', 0.5))
        SELECT e.event_type, COUNT(*) AS n,
               ${OracleSql.dsum("e.value * w.weight")} AS weighted_sum
        FROM events e JOIN w USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
      """)),
    // ----------------------------------------------------------------
    // First-order event-type transition matrix per user: pair counts
    // and P(next | prev) in exact ppb (integer floor-division — the
    // q107 convention). Oracle rebuilds the pairs with a LAG window.
    Q(
      "q118_transition_matrix",
      (s, dir) => {
        import s.implicits._
        Funnel.transitionMatrix(
            t(s, dir, "events"), $"user_id", $"ts", $"event_type", $"event_id")
          .orderBy($"from_state", $"to_state")
      },
      Some("""
        WITH p AS (
          SELECT LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_state,
                 event_type AS to_state
          FROM events),
        c AS (
          SELECT from_state, to_state, COUNT(*) AS n
          FROM p WHERE from_state IS NOT NULL
          GROUP BY from_state, to_state),
        tot AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS tt
                FROM c GROUP BY from_state)
        SELECT c.from_state, c.to_state, c.n,
               c.n * 1000000000 // tot.tt AS prob_ppb
        FROM c JOIN tot USING (from_state)
        ORDER BY from_state, to_state
      """)),
    // ----------------------------------------------------------------
    // Distribution-shape moments of l_quantity per return flag:
    // decimal-exact power sums, fixed-op-order closing formulas (see
    // Profile.moments scaladoc) — the oracle replays the identical
    // IEEE operation sequence.
    Q(
      "q119_moments",
      (s, dir) => {
        import s.implicits._
        Profile.moments(t(s, dir, "lineitem"), Seq("l_returnflag"), $"l_quantity")
          .orderBy($"l_returnflag")
      },
      Some(s"""
        WITH a AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("x")} AS s1,
                 ${OracleSql.dsum("x * x")} AS s2,
                 ${OracleSql.dsum("x * x * x")} AS s3,
                 ${OracleSql.dsum("x * x * x * x")} AS s4
          FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x FROM lineitem)
          GROUP BY l_returnflag),
        b AS (SELECT *, s1 / n AS mu FROM a),
        m AS (
          SELECT l_returnflag, n, mu,
                 s2 - mu * s1 AS m2,
                 s3 - 3.0 * mu * s2 + 2.0 * mu * mu * s1 AS m3,
                 s4 - 4.0 * mu * s3 + 6.0 * mu * mu * s2
                    - 3.0 * mu * mu * mu * s1 AS m4
          FROM b)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, mu AS mean,
               m2 / n AS variance,
               CASE WHEN m2 > 0
                    THEN (m3 / n) / ((m2 / n) * sqrt(m2 / n)) END AS skewness,
               CASE WHEN m2 > 0
                    THEN (m4 / n) / ((m2 / n) * (m2 / n)) - 3.0 END AS kurtosis
        FROM m ORDER BY l_returnflag
      """))
  )
}
