package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => f}

/** Oracle-stable rounding.
  *
  * Spark's `round(col, k)` converts the double through its shortest decimal
  * representation (BigDecimal.valueOf) before rounding HALF_UP, so a binary
  * value of 8298.674999..94 whose shortest repr is "8298.675" rounds UP to
  * 8298.68. C-family engines (DuckDB included) compute round(x*10^k)/10^k on
  * the binary value and get 8298.67. Scale-0 rounding agrees between both
  * schemes for every double, so multiply-round-divide reproduces the
  * C semantics exactly. Import this `round` (shadowing functions.round) in
  * query code that must hash-match a DuckDB oracle.
  */
object Fns {
  def round(c: Column, k: Int): Column =
    if (k == 0) f.round(c)
    else { val p = math.pow(10, k); f.round(c * p) / p }
  def round(c: Column): Column = f.round(c)
}
