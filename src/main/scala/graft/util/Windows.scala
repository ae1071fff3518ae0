package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window specs for PROVABLY BOUNDED frames. */
object Windows {

  /** Global-order window over a frame that is bounded BY CONSTRUCTION
    * — a post-`limit(k)` top-k, a value grid (O(√N) distinct
    * frequencies / ≤1000·max_bits millibit values), or a dimension
    * table (schemas, buckets, months). Semantically identical to
    * `Window.orderBy(...)` (one partition holds every row either way;
    * rank/row_number/cumulative frames see the same ordered stream),
    * but the constant partition key keeps WindowExec from logging the
    * corpus-scale "No Partition Defined … moving all data to a single
    * partition" warning for frames that can never be corpus-scale.
    * The engine's corpus-scale rankings never use this: they go
    * through orderBy+limit (TakeOrderedAndProject) first — see
    * Retrieval.bm25TopK — and only re-rank the ≤k survivors here.
    * Do NOT point this at an unbounded frame: it executes exactly like
    * an unpartitioned window (everything in one task). */
  def bounded(order: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)
}
