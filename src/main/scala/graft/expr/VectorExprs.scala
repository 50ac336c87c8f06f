package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{ColumnBridge, DotProductF, L2SqMicroF, MinhashSigsF, SeedGramHashesF, ShotCountF, SimhashF, SortedIntersectCountL, WinnowFp}

/** graft-side facade over the custom Catalyst vector expressions (the
  * expressions themselves live in the sql-package shim because their
  * supertypes are private[sql] — see ColumnBridge.scala). */
object VectorExprs {

  /** Native codegen'd float-array dot product (DOUBLE accumulation in
    * index order — bit-compatible with the zip_with/aggregate fold). */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProductF(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  /** Native codegen'd micro-unit squared L2 distance (floor(‖a−b‖²·10⁶)
    * as LONG — bit-compatible with the zip_with/aggregate/floor fold). */
  def l2sqMicroF(a: Column, b: Column): Column =
    ColumnBridge.toColumn(L2SqMicroF(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  /** Native sorted-LONG-array intersection count (two-pointer merge —
    * equals `size(array_intersect(a, b))` for sorted inputs). */
  def sortedIntersectCountL(a: Column, b: Column): Column =
    ColumnBridge.toColumn(SortedIntersectCountL(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  /** Native winnowing fingerprint (min `w`-char-window md5-prefix hash;
    * bit-compatible with the transform/array_min composition). */
  def winnowFp(text: Column, w: Int): Column =
    ColumnBridge.toColumn(WinnowFp(ColumnBridge.toExpression(text), w))

  /** Native per-row MinHash signature array (k per-permutation minima
    * over the text's word-trigram shingles; bit-compatible with the
    * batch explode→16-min-aggregate pipeline, null when sub-trigram). */
  def minhashSigsF(text: Column, k: Int): Column =
    ColumnBridge.toColumn(MinhashSigsF(ColumnBridge.toExpression(text), k))

  /** Native per-row shot count over the payload bytes (one O(n) pass
    * inside whole-stage codegen; bit-compatible with the HOF kernel on
    * the ASCII corpus contract). */
  def shotCountF(text: Column, frameSize: Int, levelJump: Int): Column =
    ColumnBridge.toColumn(ShotCountF(
      ColumnBridge.toExpression(text), frameSize, levelJump))

  /** Native per-row VAD statistics [n_frames, voiced_frames,
    * n_segments, max_segment_frames] over the payload bytes (hangover
    * merge included — one O(n) pass inside whole-stage codegen;
    * row-equal to Multimodal.vadSegments' per-audio aggregate). */
  def vadStatsF(text: Column, frameSize: Int, threshold: Int, minGap: Int): Column =
    ColumnBridge.toColumn(org.apache.spark.sql.graftshim.VadStatsF(
      ColumnBridge.toExpression(text), frameSize, threshold, minGap))

  /** Native per-row SimHash signature (one pass over the row's tokens
    * inside codegen — signature building becomes a narrow map; the
    * integer vote sums make it bit-identical to the explode→aggregate
    * form whatever the order). */
  def simhashF(text: Column, bits: Int): Column =
    ColumnBridge.toColumn(SimhashF(ColumnBridge.toExpression(text), bits))

  /** Native n-gram window vector (space-joined n-token windows, index =
    * 0-based token position; bit-identical to the transform/sequence/
    * concat_ws composition incl. null-skipping joins). */
  def gramsF(toks: Column, n: Int): Column =
    ColumnBridge.toColumn(org.apache.spark.sql.graftshim.GramsF(
      ColumnBridge.toExpression(toks), n))

  /** Native all-tables LSH bucket-key vector (sign-random-projection
    * against the cached house plane family; bit-identical to the
    * per-table literal-plane dot/when tree, one kernel call per row). */
  def lshBucketsF(vec: Column, tables: Int, planes: Int, dims: Int): Column =
    ColumnBridge.toColumn(org.apache.spark.sql.graftshim.LshBucketsF(
      ColumnBridge.toExpression(vec), tables, planes, dims))

  /** Native per-row positional seed-gram hash vector (index = 0-based
    * token position; value = hx of the seedW-token window string —
    * bit-identical to the transform/array_join/hx composition it
    * replaces, without materializing the gram strings or hex digests). */
  def seedGramHashesF(text: Column, seedW: Int): Column =
    ColumnBridge.toColumn(SeedGramHashesF(ColumnBridge.toExpression(text), seedW))
}
