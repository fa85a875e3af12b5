package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys when the build side is too large to
  * broadcast (the regime where AQE's skew splitting and broadcast both
  * run out).
  *
  * A plain shuffle join sends every fact row of a hot key to ONE reducer
  * — at 100 TB a single hot key becomes a single straggling task. The
  * salted form:
  *
  *   1. facts gain `salt = saltOn mod S` (any stable per-row column —
  *      deterministic, unlike `rand()`, so retried/replayed tasks
  *      produce identical output);
  *   2. the dimension is replicated S ways (explode over 0..S-1) — the
  *      dim-side cost is S×|dim|, which is the knob to size;
  *   3. the join key becomes (key, salt): each hot key now spreads over
  *      S reducers.
  *
  * Result is row-identical to the plain join by construction — for
  * inner/left joins. Right/full-outer are rejected: the dimension is
  * replicated S×, so every unmatched dim row would be emitted S times.
  */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def salted(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      saltOn: Column, saltCount: Int, joinType: String = "inner"): DataFrame = {
    require(supportedJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"salted join supports inner/left join types, not '$joinType': " +
        "the replicated dimension would emit unmatched right-side rows saltCount times")
    val f = facts.withColumn("__salt", pmod(saltOn, lit(saltCount)))
    val d = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltCount - 1))))
      .withColumn("__salt", col("__salt").cast(f.schema("__salt").dataType))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"), joinType)
      .drop("__salt")
  }
}
