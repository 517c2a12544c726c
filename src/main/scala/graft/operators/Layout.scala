package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering for
  * parquet, the technique that makes a 100 TB table prunable on TWO
  * correlated filter dimensions at once.
  *
  * A table range-partitioned and sorted on one column prunes
  * files/row-groups by that column's min/max stats only; a box query
  * over (x, y) still scans every file for the unsorted dimension.
  * Interleaving the bits of both keys into one `zkey` and laying the
  * table out in zkey order makes each file a small axis-aligned tile of
  * (x, y) space, so BOTH columns' parquet min/max stats come out tight
  * per file — a 2-D box query reads only the tiles it intersects, and
  * the pruning predicate is an ordinary zkey range that pushes down to
  * the scan like any other filter (no custom reader anywhere).
  *
  * Everything here is pure integer arithmetic over
  * `org.apache.spark.sql.functions` — codegen'd, shuffle-free at query
  * time; the one layout-time shuffle is the `repartitionByRange`, whose
  * range sampling keeps output files balanced under any zkey skew. */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Inputs are masked to `bits` bits, so the result is always in
    * [0, 4^bits); callers quantize coordinates into that domain first
    * (e.g. `pmod`, or epoch-seconds div a cell width).
    *
    * The bit-spread is monotone order-preserving in each coordinate
    * (bit significance order is preserved), which is what makes
    * [[zRange]]'s box bound valid. Composed from shiftleft /
    * shiftrightunsigned / bitwiseAND — all whole-stage-codegen integer
    * ops, ~4·bits instructions per row, no UDF. */
  def zkey2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zkey2: bits=$bits out of [1,31]")
    val mask = (1L << bits) - 1
    val xl = x.cast("long").bitwiseAND(lit(mask))
    val yl = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Scala-side twin of [[zkey2]] for driver-side bound computation. */
  def zkey2Long(x: Long, y: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31)
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >>> i) & 1L) << (2 * i)) | (((ym >>> i) & 1L) << (2 * i + 1))
    }
  }

  /** Coarse zkey bound of the axis-aligned box [xlo,xhi]×[ylo,yhi]:
    * because the bit-spread is monotone in each coordinate,
    * z(x,y) ∈ [z(xlo,ylo), z(xhi,yhi)] for every point of the box. The
    * bound is valid but not tight (the z curve leaves and re-enters a
    * box), so it PRUNES — the exact box predicate stays on as the
    * residual filter, exactly like a partition-pruning predicate plus
    * its row filter. */
  def zRange(xlo: Long, xhi: Long, ylo: Long, yhi: Long, bits: Int): (Long, Long) = {
    require(xlo <= xhi && ylo <= yhi, s"zRange: empty box [$xlo,$xhi]×[$ylo,$yhi]")
    (zkey2Long(xlo, ylo, bits), zkey2Long(xhi, yhi, bits))
  }

  /** Write `df` Z-ordered on (xCol, yCol): append `zkey`, range-
    * partition into `nFiles` contiguous zkey ranges (sampled bounds —
    * balanced files under any key skew), sort within each, write
    * parquet. Each output file is then a tile: tight min/max on zkey
    * AND on both source columns, which is what the scan-side stats
    * pruning feeds on. The layout costs exactly one shuffle, paid once
    * at write time — the read path below is shuffle-free. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nFiles: Int, path: String): Unit = {
    require(!df.columns.contains("zkey"),
      "writeZOrdered: input already has a zkey column")
    df.withColumn("zkey", zkey2(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files COMPACTION — the table-maintenance pass every
    * long-lived 100 TB store needs: streaming sinks and frequent small
    * ingests accrete KB-scale files, and scan cost degrades with file
    * COUNT (open/footer/seek per file, one scheduler task per split)
    * long before it degrades with bytes. Compaction rewrites a
    * directory into ceil(totalBytes / targetBytes) files.
    *
    * The file inventory is DRIVER-SIDE METADATA ONLY (a FileSystem
    * listing — no data moves to the driver); the rewrite itself is one
    * round-robin `repartition` shuffle, which balances output files by
    * row count regardless of how lopsided the input files are. Written
    * OUT-OF-PLACE: compacting into the directory being read is a
    * read-over-write hazard, so the deployment pattern is write to a
    * versioned sibling then atomically swap the table pointer — the
    * same discipline as every snapshot-based table format.
    *
    * @return the number of output files chosen (for the caller's
    *         manifest/audit) */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compact: targetBytes=$targetBytes")
    require(inPath != outPath, "compact: out-of-place only (see scaladoc)")
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"compact: no parquet files under $inPath")
    val total = files.map(_.getLen).sum
    val nFiles = (math.max(1L, (total + targetBytes - 1) / targetBytes)).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Box query over a [[writeZOrdered]] layout: the coarse zkey range
    * (a plain `BETWEEN`, pushed down to parquet row-group/page stats)
    * prunes the tiles, the exact box predicate filters the residue.
    * Returns exactly the rows of the box — the zkey range is a
    * superset bound, never a filter of record. */
  def readBox(spark: org.apache.spark.sql.SparkSession, path: String,
      xCol: String, yCol: String, bits: Int,
      xlo: Long, xhi: Long, ylo: Long, yhi: Long): DataFrame = {
    val (zlo, zhi) = zRange(xlo, xhi, ylo, yhi, bits)
    spark.read.parquet(path)
      .filter(col("zkey").between(zlo, zhi))
      .filter(col(xCol).between(xlo, xhi) && col(yCol).between(ylo, yhi))
  }
}
