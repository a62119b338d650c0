package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Memory-strength decay family (reference: alma/learning/decay.py:74-131:
  * strength = e^(−0.693·days/half_life) with access/log bonus and
  * importance factor; alma/learning/forgetting.py:609-740: exponential /
  * linear / step decay curves). All pure column expressions over an
  * injected as-of — no wall clock, fully codegen'd.
  */
object DecayFunctions {

  /** Age in fractional days between an event timestamp and as-of (µs). */
  def ageDays(ts: Column, asOfUs: Column): Column =
    (asOfUs - unix_micros(ts)).cast("double") / lit(86400000000.0)

  /** e^(−0.693·d/halfLife) — the ln-2 exponential of decay.py:74-93. */
  def exponentialDecay(days: Column, halfLifeDays: Double): Column =
    exp(lit(-0.693) * days / lit(halfLifeDays))

  /** Linear decay to zero at `lifetimeDays` (forgetting.py linear). */
  def linearDecay(days: Column, lifetimeDays: Double): Column =
    greatest(lit(0.0), lit(1.0) - days / lit(lifetimeDays))

  /** Step decay: full strength inside the window, `floorValue` after. */
  def stepDecay(days: Column, windowDays: Double, floorValue: Double): Column =
    when(days <= windowDays, lit(1.0)).otherwise(lit(floorValue))

  /** Access bonus 1 + 0.1·ln(1+accessCount) (decay.py log bonus).
    * Written as ln(1+x) — not log1p — so the oracle SQL computes the
    * identical expression.
    */
  def accessBonus(accessCount: Column): Column =
    lit(1.0) + lit(0.1) * log(lit(1.0) + accessCount.cast("double"))

  /** Importance factor 0.5 + 0.5·min(importance, 1). */
  def importanceFactor(importance: Column): Column =
    lit(0.5) + lit(0.5) * least(importance, lit(1.0))

  /** Full strength model: exponential decay × access bonus ×
    * importance factor (decay.py:74-131 composition).
    */
  def strength(days: Column, accessCount: Column, importance: Column,
      halfLifeDays: Double = 30.0): Column =
    exponentialDecay(days, halfLifeDays) * accessBonus(accessCount) *
      importanceFactor(importance)
}
