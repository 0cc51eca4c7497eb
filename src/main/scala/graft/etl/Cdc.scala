package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable change-data-capture pair over keyed snapshots (k, v):
  * [[diff]] derives the minimal change set between two versions
  * (q130's classification as an operator), [[applyChanges]] merges a
  * change set into a base (q94's merge as an operator). They are
  * inverses — `applyChanges(v1, diff(v1, v2)) == v2` — and GraftProps
  * pins exactly that round-trip on generated snapshots. Both are one
  * full-outer join on the key: at 100 TB each is a single co-shuffle
  * of the two inputs, the same cost as reading them.
  */
object Cdc {

  /** Minimal change set v1 → v2 as (k, op ∈ I|U|D, new_v): inserts for
    * keys only in v2, deletes for keys only in v1, updates only where
    * the value ACTUALLY differs — unchanged rows produce nothing.
    * Null-safety twice over: the join and presence tests use `<=>` /
    * explicit presence flags so a NULL KEY is one matchable key value,
    * not "absent" (a plain equi-join never matches NULL keys, which
    * would emit spurious I+D rows for a null-keyed row present in both
    * snapshots); and the update test is null-safe so NULL→value and
    * value→NULL transitions surface as updates instead of vanishing. */
  def diff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("k").as("k1"), col("v").as("v1"), lit(true).as("in1"))
    val b = v2.select(col("k").as("k2"), col("v").as("v2"), lit(true).as("in2"))
    a.join(b, col("k1") <=> col("k2"), "full_outer")
      .select(coalesce(col("k1"), col("k2")).as("k"),
        when(col("in1").isNull, "I")
          .when(col("in2").isNull, "D")
          .when(not(col("v1") <=> col("v2")), "U").as("op"),
        col("v2").as("new_v"))
      .where(col("op").isNotNull)
  }

  /** Merge a change set into a base snapshot: D drops the row, I/U
    * take the new value, untouched keys pass through. Same null-safe
    * key join as [[diff]]. */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame =
    base.select(col("k").as("bk"), col("v").as("bv"), lit(true).as("inb"))
      .join(changes.withColumn("inc", lit(true)),
        col("bk") <=> col("k"), "full_outer")
      .where(col("inc").isNull || col("op") =!= "D")
      .select(coalesce(col("bk"), col("k")).as("k"),
        when(col("inc").isNull, col("bv")).otherwise(col("new_v")).as("v"))
}
