package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, get, lit, transform}

/** Column-level utilities shared across the operator library. */
private[graft] object ColumnUtil {

  /** LET-BINDING for Column expressions: binds `value` to a lambda
    * variable so `body` can reference it many times while it is
    * COMPUTED ONCE per row. Catalyst's CollapseProject/column pruning
    * re-inline a projected alias into every use site (an expensive
    * expression used w times runs w times — measured 5× on winnowing,
    * ~4× on quantized cosine), but a lambda variable is opaque to the
    * optimizer: `transform` over a 1-element array evaluates `value`
    * once and the body against the bound element.
    *
    * THE one implementation — Dedup/TextAnalysis/Similarity/Pq/Html all
    * import this, so a future Catalyst change that breaks the
    * array-wrapper trick is fixed in one place.
    */
  def bindOnce(value: Column, body: Column => Column): Column =
    get(transform(array(value), body), lit(0))
}
